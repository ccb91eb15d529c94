"""miru_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the capabilities of the reference engine
(enterstudio/miru, a JVM bitmap-backed multi-tenant stream/search index)
re-expressed as idiomatic Ray Data pipelines:

- ``miru_ray.functions``  — pure, deterministic kernels (tokenize, extract,
  hashing, posting codec). Shared verbatim by the distributed pipeline and
  the single-node oracle so results are bit-stable.
- ``miru_ray.sources``    — dataset readers / input adapters (pages table,
  driver testdata mapping).
- ``miru_ray.stages``     — map_batches / map_groups stage bodies
  (extract actor pool, tokenizer, partition builder, segment merge).
- ``miru_ray.state``      — index layout on disk: segments, manifests,
  stats, checkpoint/resume.
- ``miru_ray.pipelines``  — end-to-end pipelines (index build, BM25 query,
  analytics/dedup/ANN operator family for the driver contract).

Reference parity notes cite ``/root/reference`` files as ``module/path:line``.
"""

__version__ = "0.1.0"

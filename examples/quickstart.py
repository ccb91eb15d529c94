#!/usr/bin/env python
"""Quickstart: generate a small pages corpus, build the index, query it.

    python examples/quickstart.py

Covers the README surface end-to-end: build (with resume manifests),
driver-side search with filters, the actor-pool batch searcher, and the
scatter-gather path.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd
    from miru_ray.pipelines.build import BuildConfig, build_index
    from miru_ray.pipelines.search import (BatchSearcher, highlight_hits,
                                           search, search_scattered)
    from miru_ray.sources.fixtures import write_pages_parquet
    from miru_ray.state.reader import IndexReader

    pages_dir, index_dir = "/tmp/quickstart_pages", "/tmp/quickstart_index"
    shutil.rmtree(index_dir, ignore_errors=True)
    write_pages_parquet(pages_dir, 5_000, rows_per_file=1_000)

    meta = build_index(pages_dir, index_dir,
                       BuildConfig(num_parts=8, num_shards=4, store_text=True))
    print(f"built: {meta['n_docs']} docs, {meta['n_terms']} terms, "
          f"{meta['segment_bytes']//1024} KiB segments")

    reader = IndexReader(index_dir)
    hits = search(reader, "needle13", k=5)
    print("\ntop hits for 'needle13':")
    for row in highlight_hits(reader, hits, "needle13").to_pylist():
        print(f"  {row['score']:.4f}  {row['url']}  …{row['snippet'][:60]}…")

    scattered = search_scattered(index_dir, "w00001 w00002", k=3)
    print("\nscatter-gather 'w00001 w00002':",
          scattered["doc_id"].to_pylist())

    queries = rd.from_items([{"qid": i, "query": q} for i, q in
                             enumerate(["w00000", "w012*", "needle13"])])
    batch = queries.map_batches(
        BatchSearcher, fn_constructor_kwargs={"index_dir": index_dir, "k": 3},
        batch_format="pandas", concurrency=2, batch_size=4).to_pandas()
    print("\nbatch searcher:", len(batch), "result rows for 3 queries")
    ray.shutdown()


if __name__ == "__main__":
    main()

"""HTML→text extraction stage — stateful actor pool.

North-rule stage [A] (SURVEY.md §7.1): ``pages.map_batches(HtmlExtractor,
concurrency=N, batch_size=B, batch_format="pyarrow")``. The class shape
follows the reference's load-once-score-many pattern
(miru-stream-plugins/.../strut/StrutModelScorer.java — model in ctor, work
per call): parser machinery is constructed once per actor in ``__init__``,
each ``__call__`` handles one Arrow batch and drops the heavy ``html``
column immediately after extraction (SURVEY.md §7.5 "Wide docs").

Batches stay small (html can be MBs/row); output schema is the pages
schema minus ``html``.
"""

from __future__ import annotations

import pyarrow as pa

from miru_ray.functions.extract import extract_text

__all__ = ["HtmlExtractor", "EXTRACT_BATCH_SIZE"]

# html rows are KB–MB; keep batches modest so batch × concurrency fits heap.
EXTRACT_BATCH_SIZE = 256


class HtmlExtractor:
    """Actor-pool extraction: html:binary → text:string (byte-identical
    to the golden text per url — pytest-verified invariant)."""

    def __init__(self) -> None:
        # Parser state is per-call (HTMLParser is single-use); what we
        # amortize here is import + any future model/table loading.
        self._extract = extract_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pa.array([self._extract(h) for h in batch["html"].to_pylist()],
                         type=pa.string())
        cols = [batch[name] for name in batch.schema.names if name != "html"]
        names = [n for n in batch.schema.names if n != "html"]
        # replace/append extracted text
        if "text" in names:
            i = names.index("text")
            cols[i] = texts
        else:
            names.append("text")
            cols.append(texts)
        return pa.table(dict(zip(names, cols)))

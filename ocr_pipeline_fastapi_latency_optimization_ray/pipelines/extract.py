"""The flagship Ray Data extraction pipeline (SURVEY.md §7.1 stage graph).

    read_parquet(pages)                                 # column-pruned read
      -> map_batches(classify_and_split)   [stateless]  # kind sniff, partition
                                                        # hash, skew splitter
      -> map_batches(DocumentExtractor,    [actor pool] # tokenize/layout, D1
                     concurrency=(a,b),                 # merge, mask, enrich,
                     batch_size=None)                   # assemble, spans
      -> write_parquet(out, partition_cols=["part"]) + lineage sidecar

Deviations from the survey graph, by design:
  - the HTML / PDF branches are dispatched per row INSIDE the extract stage
    instead of as forked Datasets: a Dataset fork re-executes the shared
    upstream (read + classify) once per branch, which at 100 TB doubles the
    read; dispatch-in-stage streams the input exactly once and the union
    disappears. Both branch implementations remain separately testable
    (functions/html_tokenize.py, stages/layout.py).
  - the enrichment join J1 is url-local (both sides are produced from the
    same row), so it runs in-stage with no shuffle, exactly as SURVEY.md
    §2.6 recommends.

Shuffle inventory: NONE. Every grouped operation (page concat G1, counters
G2, join J1) is url-local. The only data movement is the streaming exchange
between stages and the partitioned write.

``batch_size=None`` on the extract stage makes batches == blocks, so the
skew splitter's single-row blocks for giant payloads stay isolated
(stages/classify.py).
"""

from __future__ import annotations

import ray.data

from ..config import PipelineConfig
from ..stages.classify import make_classifier
from ..stages.extract import DocumentExtractor


def read_pages(paths, columns=None) -> "ray.data.Dataset":
    """Column-pruned read of the pages table."""
    return ray.data.read_parquet(
        paths, columns=columns or ["url", "html", "text", "lang"]
    )


def build_extraction_pipeline(
    ds: "ray.data.Dataset", cfg: PipelineConfig | None = None
) -> "ray.data.Dataset":
    cfg = cfg or PipelineConfig()
    ds = ds.map_batches(
        make_classifier(cfg),
        batch_format="pyarrow",
        batch_size=None,
    )
    ds = ds.map_batches(
        DocumentExtractor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=None,  # batch == block: preserve skew isolation
        concurrency=cfg.extract_concurrency,
        num_cpus=cfg.extract_num_cpus,
    )
    return ds


def extract_pages(paths, cfg: PipelineConfig | None = None) -> "ray.data.Dataset":
    return build_extraction_pipeline(read_pages(paths), cfg)

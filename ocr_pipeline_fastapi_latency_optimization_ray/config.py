"""Pipeline configuration and byte-identity-critical constants.

Every constant here mirrors an exact semantic of the reference pipeline
(`Ashokpravin/ocr-pipeline-fastapi-Latency-optimization`, read-only checkout at
/root/reference) — file:line citations point into that tree. The values are
part of the byte-identical output contract and must not change casually.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Canonical label space (reference: DLA.py:59-80 `map_labels`)
# ---------------------------------------------------------------------------

# Raw model label -> canonical pipeline label. Exact copy of the semantic
# mapping table at DLA.py:62-80 (data, not code).
MAP_LABELS: dict[str, str] = {
    "paragraph_title": "text",
    "image": "figure",
    "text": "text",
    "number": "text",
    "abstract": "text",
    "content": "text",
    "figure_title": "text",
    "formula": "formula",
    "table": "table",
    "reference": "text",
    "doc_title": "text",
    "footnote": "text",
    "header": "text",
    "algorithm": "figure",
    "footer": "abandon",
    "seal": "figure",
    "chart": "figure",
    "formula_number": "text",
    "aside_text": "abandon",
    "reference_content": "text",
}

# Canonical classes sorted — the reference derives class ids from
# `sorted(set(map_labels.values()))` (DLA.py:84): abandon figure formula table text
CANONICAL_CLASSES: list[str] = sorted(set(MAP_LABELS.values()))
CLASS_TO_ID: dict[str, int] = {c: i for i, c in enumerate(CANONICAL_CLASSES)}

# Raw-label order = dict insertion order (DLA.py:83 `list(self.map_labels.keys())`).
RAW_CLASSES: list[str] = list(MAP_LABELS.keys())
RAW_TO_ID: dict[str, int] = {c: i for i, c in enumerate(RAW_CLASSES)}
# ind_map: raw class id -> canonical class id (DLA.py:86).
IND_MAP: list[int] = [CLASS_TO_ID[MAP_LABELS[k]] for k in RAW_CLASSES]

# Labels excluded from masking — everything NOT in this set is masked and
# receives a placeholder tag (DLA.py:627 `ignored_labels`).
UNMASKED_LABELS = frozenset({"text", "formula", "abandon"})

# ---------------------------------------------------------------------------
# Placeholder / enrichment constants
# ---------------------------------------------------------------------------

# Placeholder tag burned into the masked page, later re-parsed by regex.
# Format exactly as stamped at ContentMasker.py:65-77.
def placeholder_tag(page_num: int, label: str, index: int) -> str:
    return f"PAGE {page_num} {label}_{index}: HERE"


def placeholder_tag_fallback(page_num: int, caption: str) -> str:
    # ContentMasker.py:76-77 fallback for objects that are neither figure nor table
    return f"PAGE {page_num} {caption}: HERE"


# Tolerant placeholder regex — exact pattern from MarkdownEnricher.py:24-27.
PLACEHOLDER_PATTERN = re.compile(
    r"page\s+(\d+)\s+(figure|table)(?:[^\d\n]*(\d+))?.*?here",
    re.IGNORECASE,
)

# Sentinel emitted when the enrichment lookup misses (MarkdownEnricher.py:93-94).
def missing_crop_sentinel(obj_type: str, obj_index: str | None) -> str:
    return f"\n> **[Missing Crop] Could not find image for {obj_type} {obj_index}**\n"


# Page separator for document assembly (PageProcessor.py:112).
PAGE_SEPARATOR = "\n\n---\n\n"

# Block separator inside a page skeleton (our deterministic "main OCR" emits
# one markdown paragraph per kept block; the reference's VLM output joins
# visual paragraphs with blank lines).
BLOCK_SEPARATOR = "\n\n"

# Code-fence strip applied to the final document (PageProcessor.py:116).
FENCE = "```"

# ---------------------------------------------------------------------------
# DLA tunables (golden path values)
# ---------------------------------------------------------------------------

# Detection confidence threshold (DLA.py:137 `conf=0.38`).
CONF_THRESHOLD = 0.38
# Inclusion threshold for the first three merge passes (DLA.py:137 `iou=0.5`).
IOU_THRESHOLD = 0.5
# Box padding for table/formula/figure: 0.5% of min(H, W) (DLA.py:526-534).
BOX_PADDING_FRAC = 0.005
# Golden path runs filter_dup=True, merge_visual=False (ocr_app.py:990).
FILTER_DUP_DEFAULT = True
MERGE_VISUAL_DEFAULT = False

# Cap on fixpoint iterations of the D1 merge (reference loops unbounded,
# DLA.py:203; we cap and record in lineage — SURVEY.md §7.4).
MERGE_MAX_ITERS = 64

# ---------------------------------------------------------------------------
# HTML tokenizer heuristics (webtext analog of the layout model — SURVEY §7.1)
# ---------------------------------------------------------------------------

# A text block whose link density exceeds this is boilerplate ("abandon" —
# analog of the reference's abandon class, DLA.py:74,78).
LINK_DENSITY_ABANDON = 0.5

# class/id substrings that mark a subtree as boilerplate.
BOILERPLATE_HINTS = (
    "nav", "menu", "footer", "sidebar", "banner", "advert", "promo", "comment",
)

# Elements whose subtree is always boilerplate.
BOILERPLATE_TAGS = frozenset({"nav", "footer", "aside", "header"})

# Elements skipped entirely.
SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "head"})

# Block-level text-emitting elements.
TEXT_BLOCK_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote", "dt", "dd"}
)

# Synthetic page geometry for HTML blocks (virtual page; drives the geometry
# kernels on the HTML branch).
HTML_PAGE_WIDTH = 1000
HTML_LINE_HEIGHT = 20
HTML_LINE_CHARS = 80
HTML_BLOCK_GAP = 8

# ---------------------------------------------------------------------------
# Pipeline execution config
# ---------------------------------------------------------------------------


@dataclass
class PipelineConfig:
    """Execution knobs for the Ray Data extraction pipeline.

    Mirrors the reference's tunable surface (SURVEY.md §2.11): thresholds,
    pool sizes, batch sizes; stage list is data so tests can run single stages.
    """

    conf: float = CONF_THRESHOLD
    iou: float = IOU_THRESHOLD
    filter_dup: bool = FILTER_DUP_DEFAULT
    merge_visual: bool = MERGE_VISUAL_DEFAULT

    # Skew splitter: rows with payload larger than this get their own block
    # (size-based skew splitter — SURVEY.md §4.2; north_rule requirement).
    huge_payload_bytes: int = 4 * 1024 * 1024

    # Actor pool for the extract stage (warm layout/recognizer models).
    extract_concurrency: int | tuple[int, int] = (2, 8)
    extract_batch_size: int | None = 256
    extract_num_cpus: float = 1.0

    # Stateless enrich/assemble stage.
    assemble_batch_size: int | None = 512

    # Output partitioning: partition_id = stable_hash(url) % num_partitions.
    num_partitions: int = 64

    # Recognition engine chain by registry name (stages/layout.py
    # RECOGNIZER_REGISTRY) — the reference's model registry + primary/backup
    # failover surface (OCR.py:37-48, PageProcessor.py:19-26).
    recognizers: tuple[str, ...] = ("stub",)

    # M1 layout-model chain by registry name (stages/layout.py
    # LAYOUT_REGISTRY: 'stub' | 'paddle') — the reference's LayoutDetection
    # surface (DLA.py:54-57). The real paddle engine is import-guarded and
    # dropped when absent.
    layouts: tuple[str, ...] = ("stub",)

    # S5/M3 payload-decoder chain by registry name (sources/decoders.py
    # DECODER_REGISTRY: 'stub' | 'fitz' | 'pil') — the PDF-rasterize /
    # image-load surface (reference FileIngestor.py:239-262, DLA.py:112-130).
    # Real engines are import-guarded and dropped when absent, so
    # ("fitz", "pil", "stub") degrades to the stub in this container.
    decoders: tuple[str, ...] = ("stub",)

    # In-engine transient retry before failover (reference OCR.py:103-115:
    # tenacity stop_after_attempt(3), wait_exponential min=2 max=10). Wait
    # defaults to 0 here: the deterministic stubs never need wall-clock
    # backoff; a real endpoint engine would set ~2.0 s.
    recognizer_max_attempts: int = 3
    recognizer_retry_wait_s: float = 0.0
    recognizer_retry_max_wait_s: float = 10.0

    # M6 pre-resize pixel cap (reference OCR.py:58-88: engine-specific
    # MAX_PIXELS, downscale by sqrt(max/cur)*0.99). Default = the reference's
    # smaller engine cap; standard fake pages (1240x1754 ~ 2.2 MP) are far
    # below it, preserving byte-identity for the golden corpus.
    max_pixels: int | None = 33_177_600

    link_density_abandon: float = LINK_DENSITY_ABANDON
    boilerplate_hints: tuple[str, ...] = BOILERPLATE_HINTS

    # Memory sizing: Ray block-size target for payload-heavy inputs. None
    # keeps Ray's default (128 MiB), which at extract_batch_size=256 and
    # ~5 KB median pages holds batch x actor-pool heap use well under a
    # worker's share. For corpora whose MEDIAN payload is large (scanned
    # PDFs, images), set ~32 MiB so a batch of decoded payloads times the
    # pool's concurrency still fits in heap; apply via
    # ``apply_data_context(cfg)`` before building the pipeline.
    target_block_size_bytes: int | None = None

    extra: dict = field(default_factory=dict)

    @classmethod
    def autosize(cls, total_ram_gb: float | None = None,
                 cpus: int | None = None,
                 ram_per_actor_gb: float = 1.5,
                 system_reserve_gb: float = 4.0,
                 **overrides) -> "PipelineConfig":
        """RAM-aware actor-pool sizing — the reference's production worker
        calculation mapped onto the extract stage's actor pool
        (``compute_optimal_workers``, ocr_app.py:415-443; job variant
        utils.py:113-140):

          pool = max(2, min(int((total_ram - reserve) / ram_per_actor),
                            cpus))

        RAM is the binding constraint (the DLA/OCR engines hold decoded
        pages in memory); the pool never exceeds the CPU count (stages are
        CPU-bound) and never drops below the reference's floor of 2 (one
        CPU-bound + one I/O-bound worker overlap, ocr_app.py:425,433).
        With no arguments the host's RAM/CPU are probed via psutil —
        exactly the reference's inputs. On a multi-node cluster pass the
        PER-NODE shape: Ray schedules ``concurrency`` actors against the
        whole cluster, so scale the ceiling by the node count via
        ``overrides`` if desired.

        Returns a config whose ``extract_concurrency`` is
        ``(2, optimal)`` — a Ray autoscaling actor pool bounded by the
        same numbers the reference would compute."""
        if total_ram_gb is None:
            # the reference probes via psutil.virtual_memory().total; psutil
            # is not baked into this container, so fall back to /proc
            try:
                import psutil

                total_ram_gb = psutil.virtual_memory().total / (1024 ** 3)
            except ImportError:
                with open("/proc/meminfo") as f:
                    kb = int(next(ln for ln in f
                                  if ln.startswith("MemTotal")).split()[1])
                total_ram_gb = kb / (1024 ** 2)
        if cpus is None:
            import os

            cpus = os.cpu_count() or 2
        available = max(0.0, total_ram_gb - system_reserve_gb)
        ram_limit = int(available / ram_per_actor_gb)
        optimal = max(2, min(ram_limit, cpus))
        return cls(extract_concurrency=(2, optimal), **overrides)


def apply_data_context(cfg: "PipelineConfig") -> None:
    """Apply engine-level DataContext settings from the config (call once
    in the job driver, before building datasets). Only touches settings
    the config explicitly sets, so tests and embedding callers keep Ray's
    defaults."""
    import ray.data

    if cfg.target_block_size_bytes:
        ctx = ray.data.DataContext.get_current()
        ctx.target_max_block_size = cfg.target_block_size_bytes

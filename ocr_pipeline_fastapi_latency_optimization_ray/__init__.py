"""ray-extract: a Ray-Data-native main-content extraction engine.

Brand-new engine (not a port) with the extraction semantics of the CustomOCR
reference (`Ashokpravin/ocr-pipeline-fastapi-Latency-optimization`) re-expressed for
Common-Crawl-style web pages. See SURVEY.md for the structural analysis and
file:line citations into the read-only reference checkout.
"""

from .config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"

"""Pipelines: registry populated at import time (reference
registry.py:12-41 — the @register_pipeline decorator runs on module
import)."""

from .base import (  # noqa: F401
    BasePipeline,
    PipelineContext,
    get_pipeline,
    register_pipeline,
    slugify_item_ref_code,
)
from . import labs as _labs  # noqa: F401  (registers LaboratoryAndDiagnostic)
from . import drugs as _drugs  # noqa: F401  (registers DrugsAndMedicine)

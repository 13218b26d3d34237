"""Declared query surface. Importing this package populates REGISTRY."""

from __future__ import annotations

from .registry import REGISTRY, QuerySpec, query  # noqa: F401

# Import order mirrors SURVEY.md §7 build order; each module registers its
# queries on import.
from . import scans  # noqa: E402,F401
from . import projections  # noqa: E402,F401
from . import filters  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import sorts_sets  # noqa: E402,F401
from . import scalar_fns  # noqa: E402,F401
from . import streaming_batch  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import documents  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import funnels  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import sinks  # noqa: E402,F401


def queries_dict():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_dict():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}

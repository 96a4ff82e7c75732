"""Shared utilities: tracing profiler, logging shim, observability."""

from .profiler import Profiler, profile_scope, get_profiler

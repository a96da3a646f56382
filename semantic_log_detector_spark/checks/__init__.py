from .base import CheckResult, RunContext  # noqa: F401

from .metrics import InstanceAPEvaluator  # noqa: F401

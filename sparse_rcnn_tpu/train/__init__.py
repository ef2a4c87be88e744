from . import loop  # noqa: F401

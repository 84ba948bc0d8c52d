from .defs import REGISTRY, ExpectationSpec, get_spec

__all__ = ["REGISTRY", "ExpectationSpec", "get_spec"]

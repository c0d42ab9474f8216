"""Typed exceptions (reference: src/errors.jl:4-47)."""


class HyperSketchError(Exception):
    """Base class for all engine errors."""


class ConfigError(HyperSketchError):
    """Invalid HyperSketchConfig parameter (reference src/config.jl:40-45)."""


class InputError(HyperSketchError):
    """Invalid input table: empty, missing columns, inconsistent schema
    (reference src/errors.jl:37-47 validate_activation_dict)."""


class MergeError(HyperSketchError):
    """Attempt to merge incompatible sketches (different seed/shape/params)."""

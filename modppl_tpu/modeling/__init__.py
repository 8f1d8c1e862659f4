"""Modeling layer: the @gen DSL, handlers, and combinators."""

from modppl_tpu.modeling.gen import Gen, gen
from modppl_tpu.modeling.handlers import (
    GenerateHandler,
    RegenerateHandler,
    SimulateHandler,
    UpdateHandler,
    addr_subkey,
)

__all__ = [
    "Gen", "gen",
    "SimulateHandler", "GenerateHandler", "UpdateHandler", "RegenerateHandler",
    "addr_subkey",
]

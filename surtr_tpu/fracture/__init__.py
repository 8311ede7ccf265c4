"""The VMACH fracture pipeline — the core product operation (SURVEY §3
stacks D/E): prepare → apply fracture → island handling → refitting."""

from surtr_tpu.fracture.types import FractureContext, PieceSet
from surtr_tpu.fracture.pipeline import do_fracture, prepare_fracture

__all__ = ["FractureContext", "PieceSet", "prepare_fracture", "do_fracture"]

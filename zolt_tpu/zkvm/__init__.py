from . import lasso, prover, stages
from .prover import MultiStageProof, prove, prove_program, verify

__all__ = ["lasso", "prover", "stages", "MultiStageProof", "prove", "prove_program", "verify"]

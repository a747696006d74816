from quickrank_tpu.optimization.cleaver import Cleaver, PRUNING_METHODS
from quickrank_tpu.optimization.factory import optimization_factory

__all__ = ["Cleaver", "PRUNING_METHODS", "optimization_factory"]

from quickrank_tpu.trees.structs import Tree, EnsembleTensors
from quickrank_tpu.trees.grow import GrowConfig, fit_tree, leaf_outputs

__all__ = ["Tree", "EnsembleTensors", "GrowConfig", "fit_tree", "leaf_outputs"]

from quickrank_tpu.learning.base import LTRAlgorithm
from quickrank_tpu.learning.mart import Mart
from quickrank_tpu.learning.lambdamart import LambdaMart

__all__ = ["LTRAlgorithm", "Mart", "LambdaMart"]

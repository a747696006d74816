from quickrank_tpu.learning.base import LTRAlgorithm
from quickrank_tpu.learning.mart import Mart
from quickrank_tpu.learning.lambdamart import LambdaMart
from quickrank_tpu.learning.obliviousmart import ObliviousLambdaMart, ObliviousMart
from quickrank_tpu.learning.linear import CoordinateAscent, LineSearch

__all__ = [
    "LTRAlgorithm",
    "Mart",
    "LambdaMart",
    "ObliviousMart",
    "ObliviousLambdaMart",
    "CoordinateAscent",
    "LineSearch",
]

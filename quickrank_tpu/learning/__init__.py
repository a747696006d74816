from quickrank_tpu.learning.base import LTRAlgorithm
from quickrank_tpu.learning.mart import Mart
from quickrank_tpu.learning.lambdamart import LambdaMart
from quickrank_tpu.learning.obliviousmart import ObliviousLambdaMart, ObliviousMart
from quickrank_tpu.learning.linear import CoordinateAscent, LineSearch
from quickrank_tpu.learning.randomforest import RandomForest
from quickrank_tpu.learning.stochasticnegative import StochasticNegative
from quickrank_tpu.learning.selective import LambdaMartSelective
from quickrank_tpu.learning.dart import Dart
from quickrank_tpu.learning.rankboost import RankBoost
from quickrank_tpu.learning.custom import CustomLTR
from quickrank_tpu.learning.meta import MetaCleaver

__all__ = [
    "RankBoost",
    "CustomLTR",
    "MetaCleaver",
    "LTRAlgorithm",
    "Mart",
    "LambdaMart",
    "ObliviousMart",
    "ObliviousLambdaMart",
    "CoordinateAscent",
    "LineSearch",
    "RandomForest",
    "StochasticNegative",
    "LambdaMartSelective",
    "Dart",
]

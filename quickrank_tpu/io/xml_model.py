"""QuickRank-compatible XML model serialization.

Round-trips tree-ensemble models in the reference's format so models can be
exchanged with the original quicklearn binaries (for parity testing and
migration):

  <ranker><info><type>LAMBDAMART</type>...</info>
    <ensemble><tree id="1" weight="0.1"><split>
      <feature>1-based fid</feature><threshold>...</threshold>
      <split pos="left">...</split><split pos="right">...</split>
    </split></tree>...</ensemble></ranker>

Schema sources: RTNode::append_xml_model/parse_xml (src/learning/tree/
rtnode.cc:48-117), Ensemble::append_xml_model (ensemble.cc:133-147),
Mart::get_xml_model + Mart(xml) ctor (mart.cc:37-89, :470-491),
ObliviousMart's extra <depth> (obliviousmart.cc:35,77), and the type
dispatch of LTR_Algorithm::load_model_from_xml (ltr_algorithm.cc:85-128).
Leaf outputs use 17 significant digits (double), thresholds 9 (float), as
the reference does (rtnode.cc:59-70).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np
import jax.numpy as jnp

from quickrank_tpu.trees.structs import EnsembleTensors


# ---------------------------------------------------------------------------
# Writing
# ---------------------------------------------------------------------------


def _fmt_f(x: float) -> str:
    # 9 SIGNIFICANT digits (fractional=False), matching the reference's
    # setprecision(max_digits10) default notation (rtnode.cc:68-70) — a
    # fractional digit cap would truncate small-magnitude thresholds and
    # break float32 round-tripping.
    return np.format_float_positional(
        np.float32(x), precision=9, unique=True, trim="0", fractional=False
    )


def _fmt_d(x: float) -> str:
    return repr(float(x))


def _append_split(parent: ET.Element, ens, t: int, node: int, pos: Optional[str]):
    split = ET.SubElement(parent, "split")
    if pos:
        split.set("pos", pos)
    if ens.is_leaf[t, node]:
        ET.SubElement(split, "output").text = _fmt_d(ens.leaf_value[t, node])
    else:
        # 1-based feature ids on disk (rtnode.cc:66, parse does fid-1).
        ET.SubElement(split, "feature").text = str(int(ens.feature[t, node]) + 1)
        ET.SubElement(split, "threshold").text = _fmt_f(ens.threshold[t, node])
        _append_split(split, ens, t, int(ens.left[t, node]), "left")
        _append_split(split, ens, t, int(ens.right[t, node]), "right")


def ensemble_to_xml(ens: EnsembleTensors, info: dict, type_name: str) -> ET.Element:
    ranker = ET.Element("ranker")
    info_el = ET.SubElement(ranker, "info")
    ET.SubElement(info_el, "type").text = type_name
    for key, val in info.items():
        ET.SubElement(info_el, key).text = str(val)
    host = _HostEnsemble(ens)
    ens_el = ET.SubElement(ranker, "ensemble")
    for t in range(host.num_trees):
        tree_el = ET.SubElement(ens_el, "tree")
        tree_el.set("id", str(t + 1))
        tree_el.set("weight", _fmt_d(host.weight[t]))
        _append_split(tree_el, host, t, 0, None)
    return ranker


class _HostEnsemble:
    """Numpy view of EnsembleTensors for fast recursive serialization."""

    def __init__(self, ens: EnsembleTensors):
        self.num_trees = int(ens.num_trees)
        self.feature = np.asarray(ens.feature)
        self.threshold = np.asarray(ens.threshold)
        self.left = np.asarray(ens.left)
        self.right = np.asarray(ens.right)
        self.is_leaf = np.asarray(ens.is_leaf)
        self.leaf_value = np.asarray(ens.leaf_value)
        self.weight = np.asarray(ens.weight)


def save_model(algo, path: str) -> None:
    """Serialize a trained algorithm (counterpart of LTR_Algorithm::save,
    ltr_algorithm.cc:54-65)."""
    root = algo._to_xml()
    tree = ET.ElementTree(root)
    ET.indent(tree, space="\t")
    with open(path, "wb") as f:
        f.write(b'<?xml version="1.0"?>\n')
        tree.write(f)


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------


class _ParsedNode:
    __slots__ = ("feature", "threshold", "left", "right", "output")

    def __init__(self):
        self.feature = -1
        self.threshold = 0.0
        self.left = None
        self.right = None
        self.output = 0.0

    @property
    def is_leaf(self):
        return self.left is None


def _parse_split(el: ET.Element) -> _ParsedNode:
    n = _ParsedNode()
    for child in el:
        if child.tag == "output":
            n.output = float(child.text)
            return n
        if child.tag == "feature":
            n.feature = int(child.text) - 1  # back to 0-based
        elif child.tag == "threshold":
            n.threshold = float(child.text)
        elif child.tag == "split":
            if child.get("pos") == "left":
                n.left = _parse_split(child)
            else:
                n.right = _parse_split(child)
    return n


def _count_nodes(n: _ParsedNode) -> tuple[int, int]:
    """(num_nodes, max_depth)."""
    if n.is_leaf:
        return 1, 0
    ln, ld = _count_nodes(n.left)
    rn, rd = _count_nodes(n.right)
    return 1 + ln + rn, 1 + max(ld, rd)


def parse_ensemble(ranker: ET.Element) -> tuple[EnsembleTensors, int]:
    """<ensemble> -> dense EnsembleTensors (+ max tree depth)."""
    trees = []
    weights = []
    for tree_el in ranker.find("ensemble"):
        weights.append(float(tree_el.get("weight", "1.0")))
        trees.append(_parse_split(tree_el.find("split")))
    T = len(trees)
    counts = [_count_nodes(t) for t in trees]
    max_nodes = max(c[0] for c in counts) if counts else 1
    max_depth = max(c[1] for c in counts) if counts else 0

    feature = np.full((T, max_nodes), -1, np.int32)
    threshold = np.zeros((T, max_nodes), np.float32)
    left = np.zeros((T, max_nodes), np.int32)
    right = np.zeros((T, max_nodes), np.int32)
    is_leaf = np.ones((T, max_nodes), bool)
    leaf_value = np.zeros((T, max_nodes), np.float32)

    for t, root in enumerate(trees):
        counter = [0]

        def assign(n: _ParsedNode) -> int:
            i = counter[0]
            counter[0] += 1
            if n.is_leaf:
                leaf_value[t, i] = n.output
            else:
                feature[t, i] = n.feature
                threshold[t, i] = n.threshold
                is_leaf[t, i] = False
                left[t, i] = assign(n.left)
                right[t, i] = assign(n.right)
            return i

        assign(root)

    ens = EnsembleTensors(
        feature=jnp.asarray(feature),
        threshold=jnp.asarray(threshold),
        threshold_bin=jnp.full((T, max_nodes), -1, jnp.int32),
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        is_leaf=jnp.asarray(is_leaf),
        leaf_value=jnp.asarray(leaf_value),
        weight=jnp.asarray(np.asarray(weights, np.float32)),
        num_trees=jnp.asarray(T, jnp.int32),
    )
    return ens, max_depth


def _registry():
    from quickrank_tpu.learning.mart import Mart
    from quickrank_tpu.learning.lambdamart import LambdaMart
    from quickrank_tpu.learning.obliviousmart import (
        ObliviousLambdaMart,
        ObliviousMart,
    )

    reg = {
        "MART": Mart,
        "LAMBDAMART": LambdaMart,
        "OBVMART": ObliviousMart,
        "OBVLAMBDAMART": ObliviousLambdaMart,
    }
    try:
        from quickrank_tpu.learning.dart import Dart

        reg["DART"] = Dart
    except ImportError:
        pass
    try:
        from quickrank_tpu.learning.randomforest import RandomForest

        reg["RANDOMFOREST"] = RandomForest
    except ImportError:
        pass
    try:
        from quickrank_tpu.learning.selective import LambdaMartSelective
        from quickrank_tpu.learning.stochasticnegative import StochasticNegative

        reg["LAMBDAMART-SELECTIVE"] = LambdaMartSelective
        reg["STOCHASTIC-NEGATIVE"] = StochasticNegative
    except ImportError:
        pass
    try:
        from quickrank_tpu.learning.linear import CoordinateAscent, LineSearch

        reg["COORDASC"] = CoordinateAscent
        reg["LINESEARCH"] = LineSearch
    except ImportError:
        pass
    try:
        from quickrank_tpu.learning.rankboost import RankBoost
        from quickrank_tpu.learning.custom import CustomLTR

        reg["RANKBOOST"] = RankBoost
        reg["CUSTOM"] = CustomLTR
    except ImportError:
        pass
    try:
        from quickrank_tpu.learning.meta import MetaCleaver

        reg["METACLEAVER"] = MetaCleaver
    except ImportError:
        pass
    return reg


def load_model(path: str):
    """Type-dispatched load (ltr_algorithm.cc:85-128)."""
    root = ET.parse(path).getroot()
    type_name = root.find("info/type").text.strip()
    reg = _registry()
    if type_name not in reg:
        raise ValueError(f"unknown ranker type {type_name!r}; known: {sorted(reg)}")
    return reg[type_name]._from_xml(root)

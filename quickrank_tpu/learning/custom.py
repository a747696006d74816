"""CustomLTR — the skeleton/example algorithm.

Counterpart of ``CustomLTR`` (src/learning/custom/custom_ltr.cc): a template
showing the minimal surface a new algorithm must implement (learn /
score_dataset / save-load).  Scores every document with a fixed constant,
exactly like the reference's FIXED_SCORE example.
"""

from __future__ import annotations

import numpy as np

from quickrank_tpu.data.dataset import Dataset
from quickrank_tpu.learning.base import LTRAlgorithm


class CustomLTR(LTRAlgorithm):
    NAME = "CUSTOM"
    FIXED_SCORE = 666.0  # custom_ltr.cc's fixed score

    def __init__(self):
        self.history: dict = {}

    def learn(self, train, valid=None, metric=None, verbose=True):
        metric = metric or self.default_metric()
        if verbose:
            print(f"# {self.NAME}: fixed-score example ranker")
        self.history = {"train": [self.evaluate(train, metric)], "valid": []}
        return self.history

    def score_dataset(self, ds: Dataset) -> np.ndarray:
        return np.full(ds.num_docs, self.FIXED_SCORE, np.float64)

    def _to_xml(self):
        import xml.etree.ElementTree as ET

        root = ET.Element("ranker")
        info = ET.SubElement(root, "info")
        ET.SubElement(info, "type").text = self.NAME
        return root

    @classmethod
    def _from_xml(cls, root):
        return cls()

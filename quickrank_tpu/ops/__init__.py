"""Numeric kernels: binning, histograms, split scans, scoring, lambdas."""

"""Serving package: predictors (device pipeline) + transport (HTTP).

Split per round-3 review; ``icassp2022_depression_tpu.serve`` is the
stable import surface and re-exports everything here.
"""

from icassp2022_depression_tpu.serving import predictors, transport  # noqa: F401

from icassp2022_depression_tpu.utils import logging, profiling  # noqa: F401

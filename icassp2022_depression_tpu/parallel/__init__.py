from icassp2022_depression_tpu.parallel import collectives, mesh  # noqa: F401

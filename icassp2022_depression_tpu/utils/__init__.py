from icassp2022_depression_tpu.utils import (  # noqa: F401
    debug,
    logging,
    native,
    profiling,
    relay,
)

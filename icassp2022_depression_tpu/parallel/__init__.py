from icassp2022_depression_tpu.parallel import (  # noqa: F401
    collectives,
    distributed,
    mesh,
)

from icassp2022_depression_tpu.models import (  # noqa: F401
    audio_net,
    char_cnn,
    elmo,
    fusion,
    losses,
    porting,
    text_net,
    vggish,
)

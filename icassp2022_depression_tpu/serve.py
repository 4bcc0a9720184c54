"""End-to-end inference (serving) API — stable public surface.

The reference has no inference path at all — predictions exist only inside
its evaluation scripts.  This module is the one import users (and the
test suite) target; the implementation is split into
:mod:`.serving.predictors` (raw audio/text -> features -> model forward,
device-resident feature cache) and :mod:`.serving.transport` (stdlib
HTTP/TLS/auth front with micro-batching and bounded admission).

Typical use::

    predictor = Predictor.from_checkpoint("fuse_0.69_1.npz", task="fuse_clf")
    result = predictor.predict_speaker(waveforms, sample_rates, texts)
    # {'label': 1, 'probs': [...], 'depressed': True}

See the submodules for design notes; everything documented there is
re-exported here under its original name.
"""

from icassp2022_depression_tpu.serving.predictors import (  # noqa: F401
    TASKS,
    DaicPredictor,
    Predictor,
    _FeatureCache,
    _format_outputs,
    _model_for,
    _pow2,
)
from icassp2022_depression_tpu.serving.transport import (  # noqa: F401
    LatencyHistogram,
    ServerOverloaded,
    _DaicMicroBatcher,
    _MicroBatcher,
    make_http_server,
    serve_http,
)

__all__ = [
    "TASKS", "Predictor", "DaicPredictor", "ServerOverloaded",
    "LatencyHistogram", "make_http_server", "serve_http",
]

"""Benchmark suite: the end-to-end pipeline and its stages, TPU vs the
reference's CPU design.

Prints one JSON line per metric ({"metric", "value", "unit",
"vs_baseline"}), ending with the headline **end-to-end pipeline** line
(feature extraction + full 3-fold audio-classifier training), whose
``vs_baseline`` machine-checks BASELINE.md's >=5x claim
(``meets_target``).

Stages and their baselines (all baselines measured on this machine):

* relay_weather — emitted FIRST: the session's measured host<->device
  link condition (round-trip latency + up/down bandwidth,
  ``utils/relay.py``), so every relay-bound line below — and every
  round-over-round comparison — is interpretable against the weather
  that produced it.  ``vs_baseline`` compares the round-trip to the
  documented typical ~0.45 s (>1 = faster link than typical).
* extraction_throughput — wav2vlad over EATD-scale utterances (486 x ~5 s,
  int16 wire, bucketed device batches) vs a per-utterance NumPy oracle of
  the same mel+NetVLAD math.  Conservative: the reference additionally
  rebuilds a TF1 graph per utterance
  (``Classification/audio_features_whole.py:65-71``), which this baseline
  does not charge for.
* {audio,text,fuse}_clf / audio_reg train epoch times — the framework's
  compiled whole-fold programs (fold 1 warms the cache; folds 2-3 are the
  measurement, including per-epoch full-batch eval + gating) vs the
  reference's training-epoch structure in PyTorch (module definitions,
  Python minibatch loop, CPU; 6 epochs measured, per-epoch cost is flat).
* elmo_text_throughput — the full pretrained-text pipeline (char-CNN +
  2-layer biLSTMP at the real zhs 4096x512 geometry, 99M params) steady
  sent/s vs the torch-CPU biLM; machine-checked against a floor.
* lstmp_hbm_utilization — the streaming Pallas LSTMP kernel's achieved
  HBM bandwidth vs the ~800 GB/s v5e peak (the biLM is bandwidth-bound
  on its per-step weight stream); machine-checked against a floor.
* serving_throughput — raw wav -> prediction through the public
  Predictor (batch 32), vs the extraction-bound ceiling of serving built
  on the reference's design; plus the cache-hit repeat-speaker latency.
* daic_split_extraction — split-level DAIC extraction (one fused
  readback per split) vs the per-participant composition (one blocking
  readback each, the reference-shaped loop); identical math, the delta
  is pure relay round-trip latency.
* end_to_end_pipeline — extraction + 3 folds x 169 epochs of audio-clf
  training as ONE measured wall clock of the fused product path
  (device-resident features, ``bench_e2e_fused``); the CPU side
  extrapolates the measured torch epoch time to the reference's full
  169-epoch, 3-fold schedule.  ``end_to_end_pipeline_sum`` keeps the
  round-2/3-comparable decomposed composition (extraction median +
  training term, each stage timed separately with its own readback).
  The serial and ``--vmap-folds`` fused configurations are measured
  EARLY in the run (before other stages accumulate process/device
  state — a real product run is the only workload in its process) as
  two steady-state blocks with separately timed warm (compile) passes
  and raw per-pass times, then EMITTED last; the final line also embeds
  the weather probe and the key stage medians so a tail-truncated
  ``BENCH_r{N}.json`` stays self-contained.

The reference-TF extraction baseline runs as ``python bench.py
--tf-baseline N`` in a fresh subprocess (>=12 samples, mean +- spread
recorded in the extraction line) so TF thread pools never share the
process with the JAX TPU client.
"""

import json
import sys
import time

import numpy as np

SR = 16000
N_SPEAKERS = 162
N_DEP = 30


def make_data(seed=0, n=N_SPEAKERS, n_dep=N_DEP, dim=256):
    rng = np.random.default_rng(seed)
    targets = np.zeros(n, np.int64)
    targets[rng.choice(n, n_dep, replace=False)] = 1
    sign = np.where(targets[:, None, None] == 1, 0.3, -0.3)
    features = (sign + rng.standard_normal((n, 3, dim))).astype(np.float32)
    return features, targets


def make_wavs(seed=0, n_utts=3 * N_SPEAKERS, mean_s=5.0):
    rng = np.random.default_rng(seed)
    wavs = []
    for _ in range(n_utts):
        n = int(SR * rng.uniform(0.6 * mean_s, 1.4 * mean_s))
        wavs.append((rng.standard_normal(n) * 3000).astype(np.int16))
    return wavs


# ---------------------------------------------------------------------------
# Extraction
# ---------------------------------------------------------------------------


def _pass_stats(dts):
    """Median + spread over repeated timed passes of a relay-bound stage.

    The host<->device relay's bandwidth is volatile session-to-session
    (measured 16-900 MB/s) and its latency spikes within a session, so a
    single draw is weather, not capability: the reported value is the
    MEDIAN of N passes and every line carries min/max so round-over-round
    comparisons can tell regression from weather."""
    dts = sorted(float(d) for d in dts)
    n = len(dts)
    med = (dts[n // 2] if n % 2 else 0.5 * (dts[n // 2 - 1] + dts[n // 2]))
    return {"median_s": med, "min_s": dts[0], "max_s": dts[-1], "passes": n}


def bench_extraction_tpu(wavs, passes=3):
    from icassp2022_depression_tpu.frontend import audio

    cfg = audio.FrontendConfig()
    # warm pass covers every bucket shape (compiles are one-time and
    # persisted; steady-state throughput is the metric), then
    # median-of-``passes`` timed passes (see _pass_stats).
    audio.extract_batch(wavs, [SR] * len(wavs), cfg)
    dts = []
    for _ in range(passes):
        t0 = time.time()
        out = audio.extract_batch(wavs, [SR] * len(wavs), cfg)
        dts.append(time.time() - t0)
    assert out.shape == (len(wavs), cfg.netvlad_output_dim)
    stats = _pass_stats(dts)
    return len(wavs) / stats["median_s"], stats


def _numpy_logmel(w, fb, win):
    y = np.pad(w.astype(np.float32), 1024, mode="reflect")
    n_frames = 1 + (len(y) - 2048) // 512
    idx = (np.arange(n_frames)[:, None] * 512 + np.arange(2048))
    spec = np.abs(np.fft.rfft(y[idx] * win, axis=-1)) ** 2
    return np.log(np.maximum(1e-6, spec @ fb.T))            # [T, 80]


def bench_extraction_numpy(wavs, max_utts=48):
    """Per-utterance NumPy wav2vlad oracle (mel -> log -> NetVLAD): the
    reference's math WITHOUT its per-utterance TF graph rebuild — a much
    stronger CPU baseline than the reference itself."""
    from icassp2022_depression_tpu.ops import mel as mel_ops

    fb = mel_ops.mel_filterbank(SR, 2048, 80)
    win = mel_ops.hann_window(2048)
    rng = np.random.default_rng(0)
    k, d_out = 16, 256
    cw = rng.standard_normal((80, k)).astype(np.float32)
    cb = rng.standard_normal(k).astype(np.float32)
    c2 = rng.standard_normal((1, 80, k)).astype(np.float32)
    hw = rng.standard_normal((80 * k, d_out)).astype(np.float32)

    t0 = time.time()
    for w in wavs[:max_utts]:
        m = _numpy_logmel(w, fb, win)
        a = m @ cw + cb                                     # soft assign
        a = np.exp(a - a.max(-1, keepdims=True))
        a /= a.sum(-1, keepdims=True)
        a_sum = a.sum(0, keepdims=True)
        vlad = (m.T @ a) - a_sum * c2[0]                    # [80, K]
        vlad /= np.maximum(np.linalg.norm(vlad, axis=0, keepdims=True),
                           1e-12)
        v = vlad.reshape(-1)
        v /= max(np.linalg.norm(v), 1e-12)
        _ = v @ hw
    dt = time.time() - t0
    return max_utts / dt, dt / max_utts * len(wavs)


def bench_extraction_reference_tf(wavs, max_utts=12):
    """The reference's ACTUAL per-utterance path: a fresh TF1 graph with a
    randomly-initialised NetVLAD layer and a throwaway session per
    utterance (``Classification/audio_features_whole.py:65-71``); mel via
    NumPy (librosa absent — charges the reference nothing for mel).

    Returns per-utterance wall times.  Normally run in a SUBPROCESS
    (``--tf-baseline``) so TF's thread pools never share the process with
    the JAX TPU client (that contention biased earlier 3-sample runs)."""
    from icassp2022_depression_tpu.ops import mel as mel_ops

    import tensorflow.compat.v1 as tf1

    tf1.disable_eager_execution()
    fb = mel_ops.mel_filterbank(SR, 2048, 80)
    win = mel_ops.hann_window(2048)
    k, d_out = 16, 256

    per_utt = []
    for w in wavs[:max_utts]:
        t0 = time.time()
        m = _numpy_logmel(w, fb, win).astype(np.float32)
        graph = tf1.Graph()
        with graph.as_default():
            x = tf1.placeholder(tf1.float32, [None, 80])
            cw = tf1.get_variable(
                "cluster_weights", [80, k],
                initializer=tf1.random_normal_initializer(stddev=1.0))
            cb = tf1.get_variable(
                "cluster_biases", [k],
                initializer=tf1.random_normal_initializer(stddev=1.0))
            c2 = tf1.get_variable(
                "cluster_weights2", [1, 80, k],
                initializer=tf1.random_normal_initializer(stddev=1.0))
            hw = tf1.get_variable(
                "hidden1_weights", [80 * k, d_out],
                initializer=tf1.random_normal_initializer(stddev=1.0))
            a = tf1.nn.softmax(tf1.matmul(x, cw) + cb)
            a_sum = tf1.reduce_sum(a, 0, keepdims=True)
            vlad = tf1.matmul(x, a, transpose_a=True) - a_sum * c2[0]
            vlad = tf1.nn.l2_normalize(vlad, 0)
            v = tf1.nn.l2_normalize(tf1.reshape(vlad, [1, -1]), 1)
            out = tf1.matmul(v, hw)
            init = tf1.global_variables_initializer()
            with tf1.Session(graph=graph) as sess:
                sess.run(init)
                sess.run(out, feed_dict={x: m})
        per_utt.append(time.time() - t0)
    return per_utt


def run_reference_tf_subprocess(n_utts=12, timeout_s=600):
    """Measure the reference-TF extraction baseline in a fresh process
    (``python bench.py --tf-baseline N``): the child regenerates the same
    deterministic wavs (seed 0) and prints per-utterance times as JSON.
    Returns (utt_per_s, full_corpus_s, per_utt_times, mean_s, std_s);
    raises on any child failure (caller falls back to the NumPy oracle)."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, __file__, "--tf-baseline", str(n_utts)],
        capture_output=True, text=True, timeout=timeout_s)
    if proc.returncode != 0:
        raise RuntimeError(f"tf baseline subprocess failed: "
                           f"{proc.stderr.strip()[-400:]}")
    per_utt = json.loads(proc.stdout.strip().splitlines()[-1])["per_utt_s"]
    per_utt = np.asarray(per_utt, np.float64)
    mean_s = float(per_utt.mean())
    n_total = 3 * N_SPEAKERS
    return (1.0 / mean_s, mean_s * n_total, per_utt.tolist(), mean_s,
            float(per_utt.std()))


# ---------------------------------------------------------------------------
# Trainers (TPU side): fold 1 warms, folds 2-3 measured
# ---------------------------------------------------------------------------


def _steady_epoch_ms(train_once, n_epochs_per_fold):
    train_once(warm=True)
    t0 = time.time()
    train_once(warm=False)
    return (time.time() - t0) / (2 * n_epochs_per_fold) * 1000.0


def bench_audio_clf_tpu(features, targets):
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.train import trainers

    tf = folds.generate_clf_folds(targets, 3, seed=0)

    def run(warm):
        trainers.train_audio_clf(features, targets, tf[:1] if warm
                                 else tf[1:], C.AUDIO_CLF, seed=0)

    return _steady_epoch_ms(lambda warm: run(warm), C.AUDIO_CLF.epochs - 1)


def bench_audio_clf_vmapped_tpu(features, targets):
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.train import trainers

    tf = folds.generate_clf_folds(targets, 3, seed=0)
    trainers.train_audio_clf(features, targets, tf, C.AUDIO_CLF, seed=0,
                             vmap_folds=True)  # warm
    t0 = time.time()
    trainers.train_audio_clf(features, targets, tf, C.AUDIO_CLF, seed=0,
                             vmap_folds=True)
    return (time.time() - t0) / (3 * (C.AUDIO_CLF.epochs - 1)) * 1000.0


def bench_text_clf_tpu(text_features, targets):
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.train import trainers

    tf = folds.generate_clf_folds(targets, 3, seed=0)

    def run(warm):
        trainers.train_text_clf(text_features, targets, tf[:1] if warm
                                else tf[1:], C.TEXT_CLF, seed=0)

    return _steady_epoch_ms(lambda warm: run(warm), C.TEXT_CLF.epochs - 1)


def bench_fuse_clf_tpu(features, text_features, targets):
    import jax

    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.models import audio_net, text_net
    from icassp2022_depression_tpu.train import trainers

    tf = folds.generate_clf_folds(targets, 3, seed=0)
    branch = []
    for fold in range(3):
        ka = jax.random.fold_in(jax.random.PRNGKey(10), fold)
        kt = jax.random.fold_in(jax.random.PRNGKey(20), fold)
        branch.append((text_net.init(kt, C.TEXT_CLF.model),
                       audio_net.init(ka, C.AUDIO_CLF.model)))

    def run(warm):
        trainers.train_fuse_clf(features, text_features, targets,
                                tf[:1] if warm else tf[1:],
                                branch[:1] if warm else branch[1:],
                                seed=0)

    return _steady_epoch_ms(lambda warm: run(warm),
                            C.FUSE_CLF_TRAINER.epochs - 1)


def bench_e2e_fused(wavs, targets, passes=3):
    """Measured wall-clock of the FUSED extract->train product path:
    ``extract_batch(device=True)`` -> [162, 3, 256] device array ->
    ``train_audio_clf`` (3 folds x 169 epochs, serial product config),
    whose fold data is materialised by on-device gathers
    (``train.loop.fold_data_from_plans``) — features never return to the
    host between extraction and training, so the pipeline pays the relay
    once for the PCM upload and once for the final metrics readback,
    dropping the extraction readback + feature re-upload (~0.9 s of relay
    latency) that the decomposed sum charges.  Results are identical to
    the host-features path (tests/test_device_pipeline.py).

    Measures BOTH product configurations — serial folds and
    ``--vmap-folds`` (all folds as ONE compiled program,
    identical-within-tolerance results, tests/test_vmap_folds.py) — as
    two consecutive steady-state blocks, serial first.  Interleaving the
    passes (serial, vmapped, serial, ...) was tried for same-weather
    fairness and measured WORSE than either block alone: alternating the
    two large compiled programs degraded BOTH configs' passes by 30-100%
    within three rounds (2026-08-19, solo session: interleaved serial
    [4.14, 7.2, 7.01] / vmapped [5.53, 8.36, 7.62] vs same-session
    separate blocks [3.01, 2.92, 3.01] / [2.86, 4.2, 3.91]) — a bench
    artifact no real user pays, since a product run executes one
    configuration per process.  Each configuration's warm pass
    (compile + cache fill) is timed separately and reported as
    ``warm_s``, and the raw ``pass_s`` list makes any weather outlier
    visible in the artifact, so cache state or a single stalled pass can
    never masquerade as capability."""
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.frontend import audio
    from icassp2022_depression_tpu.train import trainers

    cfg = audio.FrontendConfig()
    tf = folds.generate_clf_folds(targets, 3, seed=0)

    def run(vmap_folds):
        feats = audio.extract_batch(wavs, [SR] * len(wavs), cfg,
                                    device=True)
        feats3 = feats.reshape(len(targets), 3, -1)
        # returns host-read best metrics: the timed region includes the
        # one blocking readback a real user pays
        return trainers.train_audio_clf(feats3, targets, tf, C.AUDIO_CLF,
                                        seed=0, vmap_folds=vmap_folds)

    out = {}
    for key, vm in (("serial", False), ("vmapped", True)):
        t0 = time.time()
        run(vm)                              # warm: compiles are cached
        out[key] = {"warm_s": round(time.time() - t0, 2), "pass_s": []}
        for _ in range(passes):
            t0 = time.time()
            run(vm)
            out[key]["pass_s"].append(time.time() - t0)
        out[key].update(_pass_stats(out[key]["pass_s"]))
        out[key]["pass_s"] = [round(t, 2) for t in out[key]["pass_s"]]
    return out["serial"], out["vmapped"]


def bench_audio_reg_tpu(features, scores):
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.train import trainers

    dep, non = folds.generate_reg_shuffles(scores, seed=0)
    trainers.train_audio_reg(features, scores, dep, non, C.AUDIO_REG,
                             seed=0)  # warm
    t0 = time.time()
    trainers.train_audio_reg(features, scores, dep, non, C.AUDIO_REG,
                             seed=0)
    dt = time.time() - t0
    return dt / (3 * (C.AUDIO_REG.epochs - 1)) * 1000.0


# ---------------------------------------------------------------------------
# Pretrained-text pipeline (ELMoForManyLangs zhs geometry) + LSTMP kernel
# ---------------------------------------------------------------------------


def _synthetic_corpus_sentences(n_sents=3 * N_SPEAKERS, seed=3):
    """EATD-scale token lists drawn from a small CJK char pool (lengths
    3..30, like jieba-segmented answers)."""
    rng = np.random.default_rng(seed)
    chars = [chr(c) for c in range(0x4E00, 0x4E00 + 200)]
    sents = []
    for _ in range(n_sents):
        n_tok = int(rng.integers(3, 31))
        sents.append(["".join(rng.choice(chars,
                                         int(rng.integers(1, 4))))
                      for _ in range(n_tok)])
    return sents


def bench_pretrained_text_tpu(n_sents=3 * N_SPEAKERS):
    """Steady-state throughput of the FULL pretrained-text pipeline at the
    real zhs geometry (char-CNN 2048 filters + 2-layer biLSTMP 4096x512,
    99M params, streaming Pallas LSTMP kernel underneath) — the
    reference's slowest modality (``text_features_whole.py:40``).
    Synthetic PRNG weights: identical FLOPs/bytes to converted ones."""
    import jax

    from icassp2022_depression_tpu.models import (char_cnn, elmo,
                                                  elmo_pretrained)

    ccfg = char_cnn.CharCnnConfig()          # zhs geometry defaults
    lcfg = elmo.ElmoLstmpConfig()            # 4096x512, 2 layers
    cc = char_cnn.init(jax.random.PRNGKey(0), ccfg)
    enc = {"layers": elmo.init_lstmp_encoder(jax.random.PRNGKey(1),
                                             lcfg)["layers"]}
    specials = ["<pad>", "<oov>", "<bos>", "<eos>", "<bow>", "<eow>"]
    char_lex = {t: i for i, t in enumerate(specials)}
    for c in range(0x4E00, 0x4E00 + 200):
        char_lex[chr(c)] = len(char_lex)
    pe = elmo_pretrained.PretrainedElmo(ccfg, lcfg, cc, enc, char_lex,
                                        None)
    sents = _synthetic_corpus_sentences(n_sents)
    pe.embed_sentences(sents)                # warm: compiles + param upload
    t0 = time.time()
    out = pe.embed_sentences(sents)
    dt = time.time() - t0
    assert out.shape == (n_sents, lcfg.output_dim)
    return n_sents / dt, dt


def bench_pretrained_text_torch(n_batches=2, batch=64, t_len=18):
    """torch-CPU baseline: the biLM alone (``nn.LSTM(512, 4096,
    proj_size=512, num_layers=2, bidirectional=True)``) at the same
    geometry/batching — charitable to torch (no char-CNN charged)."""
    torch = _torch_setup()

    rnn = torch.nn.LSTM(512, 4096, proj_size=512, num_layers=2,
                        bidirectional=True)
    x = torch.randn(t_len, batch, 512)
    with torch.no_grad():
        rnn(x)                               # warm
        t0 = time.time()
        for _ in range(n_batches):
            rnn(x)
        dt = time.time() - t0
    return n_batches * batch / dt


def bench_lstmp_hbm_utilization(b=64, t_short=64, t_long=512, reps=4,
                                peak_bytes_s=8.0e11):
    """HBM-bandwidth utilisation of the streaming Pallas LSTMP kernel at
    the zhs geometry, as the product runs it (f32 weight stream).

    Per-step HBM traffic accounted: the recurrent weight stream
    (w_h [P,4,C] + w_p [C,P], re-read every step — the reason the kernel
    is bandwidth-bound), the precomputed gate input xp (written by the
    hoisted w_x matmul, read by the kernel) and the ys/cs outputs.
    Step time = (t(t_long) - t(t_short)) / (t_long - t_short), each the
    min over ``reps`` with all runs per measurement dispatched before ONE
    blocking readback (the relay's ~0.45 s round-trip cancels in the
    difference; min rejects latency spikes).  Peak ~800 GB/s (v5e HBM)."""
    import jax
    import jax.numpy as jnp

    from icassp2022_depression_tpu.ops import rnn as rnn_ops
    from icassp2022_depression_tpu.ops import rnn_pallas

    cell, proj, din = 4096, 512, 512
    p = rnn_ops.init_lstmp(jax.random.PRNGKey(0), din, cell, proj)

    def make_run(t_steps):
        x = jax.random.normal(jax.random.PRNGKey(1), (b, t_steps, din))

        @jax.jit
        def run(xx):
            ys, h_last, _ = rnn_pallas.lstmp_layer_streamed(p, xx)
            return h_last.sum()

        run(x)                               # warm/compile
        float(run(x))

        def timed():
            t0 = time.time()
            acc = run(x)
            for _ in range(2):
                acc = acc + run(x)
            float(acc)                       # ONE blocking readback
            return (time.time() - t0) / 3.0

        return min(timed() for _ in range(reps))

    delta = 0.0
    for _ in range(3):   # the relay's volatile latency can swallow the
        dt_long = make_run(t_long)       # compute delta; retry, and if it
        dt_short = make_run(t_short)     # stays non-positive report an
        delta = dt_long - dt_short       # INVALID measurement (fails the
        if delta > 0:                    # floor) instead of clamping to a
            break                        # garbage near-zero step time
    if delta <= 0:
        return 0.0, 0.0, 0.0
    step_s = delta / (t_long - t_short)
    bytes_step = (4 * (proj * 4 * cell + cell * proj)      # weight stream
                  + 4 * (b * 4 * cell) * 2                 # xp write + read
                  + 4 * (b * proj + b * cell))             # ys + cs_pre
    bw = bytes_step / step_s
    return bw / peak_bytes_s, bw / 1e9, step_s * 1e6


def bench_daic_split_extraction(n_participants=8, seconds=6.0, passes=3):
    """Split-level DAIC extraction: ONE fused ``extract_batch`` across the
    whole split vs the per-participant composition (one blocking relay
    readback each — the shape of the reference's split loop,
    ``feature_extraction.py:83-100``, and of this framework before the
    split-level fusion).  Identical per-utterance math and ordinals
    (bit-parity pinned in tests/test_daic_train.py); the delta is pure
    relay round-trip latency (~0.45 s per blocking fetch)."""
    import tempfile
    from pathlib import Path

    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import daic as daic_fe

    tmp = Path(tempfile.mkdtemp(prefix="bench_daic_"))
    rng = np.random.default_rng(0)
    rows = ["start_time\tstop_time\tspeaker\tvalue",
            "0.0\t0.5\tEllie\thow are you doing today",
            "0.6\t2.0\tParticipant\tpretty good",
            "2.2\t2.7\tEllie\twhat are you like when you don't sleep well",
            "2.8\t4.6\tParticipant\tnot great honestly",
            "4.8\t5.1\tEllie\ti think i have asked everything i need to"]
    ids = list(range(300, 300 + n_participants))
    for pid in ids:
        d = tmp / f"{pid}_P"
        d.mkdir(parents=True)
        eatd.write_wav(d / f"{pid}_AUDIO.wav",
                       rng.standard_normal(int(SR * seconds)) * 3000, SR)
        (d / f"{pid}_TRANSCRIPT.csv").write_text("\n".join(rows) + "\n")
    qpath = tmp / "queries.txt"
    qpath.write_text("how are you doing today\n"
                     "what are you like when you don't sleep well\n")
    queries = daic_fe.load_queries(qpath)
    cfg = daic_fe.FrontendConfig()

    def fused():
        daic_fe._split_flat_features(tmp, ids, queries, cfg)

    def per_participant():
        ordinal = 0
        for pid in ids:
            f = daic_fe.extract_participant(tmp, pid, queries, cfg,
                                            ordinal)
            ordinal += len(f)

    try:
        fused(); per_participant()                # warm (compiles cached)
        f_stats = _pass_stats([_timed(fused) for _ in range(passes)])
        p_stats = _pass_stats([_timed(per_participant)
                               for _ in range(passes)])
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return f_stats, p_stats


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


SERVE_BATCH = 32


def bench_serving(batch=SERVE_BATCH, seconds=4.0, repeats=8, passes=3):
    """End-to-end serving: raw wav -> features -> model forward through
    the public Predictor, plus the content-addressed cache-hit path.

    Baseline for ``vs_baseline``: the reference *design* has no serving,
    but any serving built on it is bounded by its feature-extraction cost
    — a fresh TF1 graph per utterance, 3 utterances/speaker (~0.2 s/utt
    => ~0.6 s/speaker ~ 1.7 speakers/s; the 12-sample subprocess
    measurement above).  Cold throughput is relay-bound (raw PCM upload),
    so it is the median of ``passes`` passes over distinct uncached
    content (see _pass_stats).  Returns
    (speakers_per_s, cold_stats, repeat_ms)."""
    import jax

    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu import serve
    from icassp2022_depression_tpu.models import audio_net

    params = audio_net.init(jax.random.PRNGKey(0), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")

    def speaker(seed):
        r = np.random.default_rng(seed)
        return ([np.round(r.standard_normal(int(SR * seconds)) * 2000)
                 .astype(np.int16) for _ in range(3)], [SR] * 3)

    speakers = [speaker(i) for i in range(batch)]
    waves = [s[0] for s in speakers]
    srs = [s[1] for s in speakers]
    p.predict_batch(waves, srs)          # warm: compiles + caches features
    dts = []
    for pass_i in range(passes):
        fresh = [speaker(1000 * (pass_i + 1) + i)   # uncached content
                 for i in range(batch)]
        t0 = time.time()
        out = p.predict_batch([s[0] for s in fresh], [s[1] for s in fresh])
        dts.append(time.time() - t0)
        assert len(out) == batch
    stats = _pass_stats(dts)
    # repeat-speaker latency: cache-hit path (features memoised)
    p.predict_speaker(waveforms=waves[0], sample_rates=srs[0])
    t0 = time.time()
    for _ in range(repeats):
        p.predict_speaker(waveforms=waves[0], sample_rates=srs[0])
    repeat_ms = (time.time() - t0) / repeats * 1000.0
    return batch / stats["median_s"], stats, repeat_ms


# ---------------------------------------------------------------------------
# Torch-CPU baselines (the reference's training-epoch structure)
# ---------------------------------------------------------------------------


def _torch_setup():
    import torch

    torch.set_num_threads(max(1, (__import__("os").cpu_count() or 1)))
    return torch


def _torch_epoch_time(model, opt, crit, xt, yt, xe, bs, n_epochs=6):
    import torch

    t0 = time.time()
    for _ in range(n_epochs):
        model.train()
        for i in range(0, len(xt), bs):
            opt.zero_grad()
            loss = crit(model(xt[i:i + bs]), yt[i:i + bs])
            loss.backward()
            opt.step()
        model.eval()
        with torch.no_grad():
            model(xe)
    return (time.time() - t0) / n_epochs * 1000.0


def _clf_fold_arrays(features, targets, extra=None):
    from icassp2022_depression_tpu.data import augment, folds

    tf = folds.generate_clf_folds(targets, 3, seed=0)
    dep = np.where(targets == 1)[0]
    non = np.where(targets == 0)[0]
    arrays = [features] + ([extra] if extra is not None else [])
    (xtr, ytr), (xte, yte) = augment.augment_classification_fold(
        arrays, targets, tf[0], dep, non)
    return xtr, ytr, xte, yte


def bench_audio_clf_torch(arrays):
    torch = _torch_setup()
    import torch.nn as nn

    class AudioNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.attention_layer = nn.Sequential(nn.Linear(256, 256),
                                                 nn.ReLU(inplace=True))
            self.rnn = nn.GRU(256, 256, num_layers=2, dropout=0.5,
                              batch_first=True)
            self.ln = nn.LayerNorm(256)
            self.head = nn.Sequential(
                nn.Dropout(0.5), nn.Linear(256, 256), nn.ReLU(),
                nn.Dropout(0.5), nn.Linear(256, 2), nn.Softmax(dim=1))

        def forward(self, x):
            x = self.ln(x)
            x, _ = self.rnn(x)
            return self.head(x.mean(dim=1))

    (xtr,), ytr, (xte,), _ = arrays
    model = AudioNet()
    groups = [
        {"params": [p for n_, p in model.named_parameters()
                    if "ln" not in n_], "weight_decay": 1e-5},
        {"params": [p for n_, p in model.named_parameters() if "ln" in n_],
         "weight_decay": 0.0},
    ]
    opt = torch.optim.AdamW(groups, lr=6e-6)
    return _torch_epoch_time(model, opt, torch.nn.CrossEntropyLoss(),
                             torch.from_numpy(xtr), torch.from_numpy(ytr),
                             torch.from_numpy(xte), bs=8)


def bench_text_clf_torch(text_features, targets):
    torch = _torch_setup()
    import torch.nn as nn

    class TextNet(nn.Module):
        def __init__(self, h=128):
            super().__init__()
            self.h = h
            self.rnn = nn.LSTM(1024, h, num_layers=2, bidirectional=True,
                               dropout=0.5)
            self.attn_q = nn.Sequential(nn.Linear(2 * h, 2 * h), nn.ReLU())
            self.head = nn.Sequential(nn.Linear(h, h), nn.ReLU(),
                                      nn.Dropout(0.5), nn.Linear(h, 2),
                                      nn.Softmax(dim=1))

        def forward(self, x):
            out, (hn, _) = self.rnn(x.permute(1, 0, 2))
            out = out.permute(1, 0, 2)
            h = out[:, :, :self.h] + out[:, :, self.h:]
            q = self.attn_q(torch.cat([hn[-2], hn[-1]], dim=1))
            q = (q[:, :self.h] + q[:, self.h:]).unsqueeze(2)
            w = torch.softmax(torch.bmm(h, q).squeeze(2), dim=1)
            ctx = torch.bmm(h.transpose(1, 2), w.unsqueeze(2)).squeeze(2)
            return self.head(ctx)

    (xtr,), ytr, (xte,), _ = _clf_fold_arrays(text_features, targets)
    model = TextNet()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-5,
                            weight_decay=1e-5)
    return _torch_epoch_time(model, opt, torch.nn.CrossEntropyLoss(),
                             torch.from_numpy(xtr), torch.from_numpy(ytr),
                             torch.from_numpy(xte), bs=4)


def bench_fuse_clf_torch(features, text_features, targets):
    """Frozen branch forwards under no_grad + trainable fc_final with the
    decomposed MyLoss (``Classification/fuse_net_whole.py:336-395``)."""
    torch = _torch_setup()
    import torch.nn as nn
    import torch.nn.functional as F

    h = 128

    class Branches(nn.Module):
        def __init__(self):
            super().__init__()
            self.text_rnn = nn.LSTM(1024, h, num_layers=2,
                                    bidirectional=True, dropout=0.5)
            self.text_q = nn.Sequential(nn.Linear(2 * h, 2 * h), nn.ReLU())
            self.fc_out = nn.Sequential(nn.Linear(h, h), nn.ReLU(),
                                        nn.Dropout(0.5))
            self.ln = nn.LayerNorm(256)
            self.audio_rnn = nn.GRU(256, 256, num_layers=2, dropout=0.5,
                                    batch_first=True)
            self.fc_audio = nn.Sequential(nn.Linear(256, 256), nn.ReLU(),
                                          nn.Dropout(0.5))

        def forward(self, xa, xt):
            with torch.no_grad():
                out, (hn, _) = self.text_rnn(xt.permute(1, 0, 2))
                out = out.permute(1, 0, 2)
                hsum = out[:, :, :h] + out[:, :, h:]
                q = self.text_q(torch.cat([hn[-2], hn[-1]], dim=1))
                q = (q[:, :h] + q[:, h:]).unsqueeze(2)
                w = torch.softmax(torch.bmm(hsum, q).squeeze(2), dim=1)
                tfeat = self.fc_out(torch.bmm(
                    hsum.transpose(1, 2), w.unsqueeze(2)).squeeze(2))
                ya, _ = self.audio_rnn(self.ln(xa))
                afeat = self.fc_audio(ya.sum(dim=1))
            return tfeat, afeat

    branches = Branches()
    fc_final = nn.Linear(h + 256, 2, bias=False)
    opt = torch.optim.Adam(fc_final.parameters(), lr=8e-6)

    (xtr_a, xtr_t), ytr, (xte_a, xte_t), _ = _clf_fold_arrays(
        features, targets, extra=text_features)
    xa, xt_ = torch.from_numpy(xtr_a), torch.from_numpy(xtr_t)
    y = torch.from_numpy(ytr)
    ea, et = torch.from_numpy(xte_a), torch.from_numpy(xte_t)
    bs = 2

    def myloss(tfeat, afeat, yb):
        wt = fc_final.weight[:, :h]
        wa = fc_final.weight[:, h:]
        return (F.cross_entropy(F.linear(tfeat, wt), yb) +
                F.cross_entropy(F.linear(afeat, wa), yb))

    t0 = time.time()
    n_epochs = 4
    for _ in range(n_epochs):
        for i in range(0, len(xa), bs):
            opt.zero_grad()
            tfeat, afeat = branches(xa[i:i + bs], xt_[i:i + bs])
            myloss(tfeat, afeat, y[i:i + bs]).backward()
            opt.step()
        with torch.no_grad():
            tfeat, afeat = branches(ea, et)
            torch.softmax(fc_final(torch.cat([tfeat, afeat], dim=1)), 1)
    return (time.time() - t0) / n_epochs * 1000.0


def bench_audio_reg_torch(features, scores):
    torch = _torch_setup()
    import torch.nn as nn

    from icassp2022_depression_tpu.data import augment, folds

    class AudioRegNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = nn.GRU(256, 256, num_layers=2, dropout=0.5,
                              batch_first=True)
            self.head = nn.Sequential(
                nn.Dropout(0.5), nn.Linear(256, 256), nn.ReLU(),
                nn.Dropout(0.5), nn.Linear(256, 1), nn.ReLU())

        def forward(self, x):
            x, _ = self.rnn(x)
            return self.head(x.sum(dim=1)).squeeze(-1)

    dep, non = folds.generate_reg_shuffles(scores, seed=0)
    tr_d, tr_n, te_d, te_n = folds.reg_fold_split(dep, non, 0, 10, 44)
    (xtr_l, ytr), (xte_l, _) = augment.augment_regression_fold(
        [features], scores, tr_d, tr_n, te_d, te_n, 14)
    model = AudioRegNet()
    opt = torch.optim.Adam(model.parameters(), lr=1e-5)
    return _torch_epoch_time(model, opt, torch.nn.L1Loss(),
                             torch.from_numpy(xtr_l[0]),
                             torch.from_numpy(ytr.astype(np.float32)),
                             torch.from_numpy(xte_l[0]), bs=2)


# ---------------------------------------------------------------------------


def main():
    from icassp2022_depression_tpu import config as C

    def emit(metric, value, unit, vs_baseline, **extra):
        line = {"metric": metric, "value": round(value, 2), "unit": unit,
                "vs_baseline": round(vs_baseline, 2), **extra}
        print(json.dumps(line), flush=True)

    # relay weather context FIRST: every relay-bound line below is only
    # interpretable alongside the session's measured link condition
    # (bandwidth is session-volatile, 16-900 MB/s observed), so each
    # BENCH_r{N}.json carries its own weather.  vs_baseline compares the
    # round-trip to the documented typical ~0.45 s (>1 = faster link).
    from icassp2022_depression_tpu.utils.relay import probe_weather
    wx = probe_weather(size_mb=8.0, reps=3)
    emit("relay_weather", wx["roundtrip_s"], "s_roundtrip",
         0.45 / max(wx["roundtrip_s"], 1e-9),
         roundtrip_s=wx["roundtrip_s"], up_mb_s=wx["up_mb_s"],
         down_mb_s=wx["down_mb_s"], backend=wx["backend"],
         probe_mb=wx["probe_mb"])

    features, targets = make_data()
    rng = np.random.default_rng(7)
    text_features = (np.where(targets[:, None, None] == 1, 0.3, -0.3)
                     + rng.standard_normal(
                         (N_SPEAKERS, 3, 1024))).astype(np.float32)
    scores = (40.0 + 20.0 * targets +
              rng.standard_normal(N_SPEAKERS)).astype(np.float32)
    wavs = make_wavs()

    # extraction: vs_baseline is against the reference's actual
    # per-utterance TF1 path (>=12 samples, measured in a fresh process so
    # TF never contends with the JAX TPU client; mean +- spread recorded);
    # the (far stronger) NumPy oracle goes to stderr and anchors the
    # conservative end-to-end baseline below
    tpu_utts, ext_stats = bench_extraction_tpu(wavs)
    tpu_ext_s = ext_stats["median_s"]
    np_utts, np_ext_s = bench_extraction_numpy(wavs)
    ref_extra = {}
    ref_per_utt_mean = None
    try:
        (ref_utts, ref_ext_s, ref_per_utt, ref_mean,
         ref_std) = run_reference_tf_subprocess(n_utts=12)
        ref_per_utt_mean = ref_mean
        ref_extra = {"ref_tf_samples": len(ref_per_utt),
                     "ref_tf_mean_s": round(ref_mean, 3),
                     "ref_tf_std_s": round(ref_std, 3),
                     "ref_tf_per_utt_s": [round(t, 3)
                                          for t in ref_per_utt]}
    except Exception as exc:  # no TF / child failed -> NumPy-oracle anchor
        ref_utts, ref_ext_s = np_utts, np_ext_s
        print(f"# reference-TF baseline unavailable ({exc}): extraction "
              "vs_baseline anchored to the NumPy oracle instead",
              file=sys.stderr)
    emit("extraction_throughput", tpu_utts, "utt/s", tpu_utts / ref_utts,
         passes=ext_stats["passes"],
         utts_min=round(len(wavs) / ext_stats["max_s"], 2),
         utts_max=round(len(wavs) / ext_stats["min_s"], 2),
         pass_s=[round(ext_stats["min_s"], 3),
                 round(ext_stats["median_s"], 3),
                 round(ext_stats["max_s"], 3)],
         **ref_extra)

    # HEADLINE measured EARLY, emitted LAST: the fused product path runs
    # in a real user's process as the only workload, so it is timed here
    # — before the torch-CPU baselines and the remaining TPU stages
    # accumulate process/device state (measured +40-130% on the same
    # passes when timed at the end of the full bench: late-bench solo
    # passes [4.14-7.2] vs fresh-process [2.92-3.01], 2026-08-19).  Its
    # JSON line still closes the output (see the end of main()).
    fused, fused_v = bench_e2e_fused(wavs, targets)

    # trainers
    audio_ms = bench_audio_clf_tpu(features, targets)
    audio_torch_ms = bench_audio_clf_torch(
        _clf_fold_arrays(features, targets))
    emit("audio_clf_train_epoch_time", audio_ms, "ms/epoch",
         audio_torch_ms / audio_ms)

    # same task with all folds as ONE vmapped program (identical results,
    # bit-tested; better MXU utilisation from the 3x effective batch)
    vmap_ms = bench_audio_clf_vmapped_tpu(features, targets)
    emit("audio_clf_train_epoch_time_vmapped", vmap_ms, "ms/epoch",
         audio_torch_ms / vmap_ms)

    text_ms = bench_text_clf_tpu(text_features, targets)
    text_torch_ms = bench_text_clf_torch(text_features, targets)
    emit("text_clf_train_epoch_time", text_ms, "ms/epoch",
         text_torch_ms / text_ms)

    fuse_ms = bench_fuse_clf_tpu(features, text_features, targets)
    fuse_torch_ms = bench_fuse_clf_torch(features, text_features, targets)
    emit("fuse_clf_train_epoch_time", fuse_ms, "ms/epoch",
         fuse_torch_ms / fuse_ms)

    reg_ms = bench_audio_reg_tpu(features, scores)
    reg_torch_ms = bench_audio_reg_torch(features, scores)
    emit("audio_reg_train_epoch_time", reg_ms, "ms/epoch",
         reg_torch_ms / reg_ms)

    # pretrained-text pipeline at the real zhs geometry (the reference's
    # slowest modality) — machine-checked against a conservative floor
    elmo_sps, elmo_s = bench_pretrained_text_tpu()
    elmo_torch_sps = bench_pretrained_text_torch()
    emit("elmo_text_throughput", elmo_sps, "sent/s",
         elmo_sps / elmo_torch_sps, floor=300.0,
         meets_floor=bool(elmo_sps >= 300.0))

    # streaming LSTMP kernel HBM-bandwidth utilisation (the biLM is
    # bandwidth-bound on its ~42 MB/step f32 weight stream)
    hbm_util, hbm_gbs, step_us = bench_lstmp_hbm_utilization()
    emit("lstmp_hbm_utilization", hbm_util, "fraction_of_800GBps",
         hbm_util, floor=0.25, meets_floor=bool(hbm_util >= 0.25),
         achieved_gb_s=round(hbm_gbs, 1), step_us=round(step_us, 1))

    # serving: raw wav -> prediction through the public Predictor;
    # baseline = the extraction-bound ceiling of any serving built on the
    # reference's design (TF graph per utterance, ~1.7 speakers/s);
    # fallback uses the same 1/(3 x 0.2 s/utt) formula so the ratio
    # keeps its meaning when the TF subprocess is unavailable
    serve_sps, serve_stats, repeat_ms = bench_serving()
    ref_serve_sps = (1.0 / (3.0 * ref_per_utt_mean)
                     if ref_per_utt_mean else 1.0 / (3.0 * 0.2))
    emit("serving_throughput", serve_sps, "speakers/s",
         serve_sps / ref_serve_sps, floor=2.0,
         meets_floor=bool(serve_sps >= 2.0),
         passes=serve_stats["passes"],
         sps_min=round(SERVE_BATCH / serve_stats["max_s"], 2),
         sps_max=round(SERVE_BATCH / serve_stats["min_s"], 2),
         repeat_speaker_ms=round(repeat_ms, 1))

    # split-level DAIC extraction: one fused readback per split vs one
    # per participant (the reference-shaped loop); identical math
    n_daic = 8
    f_stats, p_stats = bench_daic_split_extraction(n_daic)
    emit("daic_split_extraction", n_daic / f_stats["median_s"],
         "participants/s", p_stats["median_s"] / f_stats["median_s"],
         passes=f_stats["passes"],
         fused_s=round(f_stats["median_s"], 2),
         fused_min_s=round(f_stats["min_s"], 2),
         fused_max_s=round(f_stats["max_s"], 2),
         per_participant_s=round(p_stats["median_s"], 2))

    # headline: end-to-end pipeline (extraction + 3x169-epoch audio clf)
    n_epochs_total = 3 * (C.AUDIO_CLF.epochs - 1)
    tpu_e2e_s = tpu_ext_s + audio_ms / 1000.0 * n_epochs_total
    # conservative CPU anchor: NumPy-oracle extraction (not the reference's
    # ~100x slower TF rebuild path) + measured torch epochs extrapolated
    # to the full 3x169-epoch schedule
    cpu_e2e_s = np_ext_s + audio_torch_ms / 1000.0 * n_epochs_total
    # the same pipeline through the vmapped product path (`train
    # --vmap-folds`: all folds as ONE compiled program, results identical
    # to serial — tests/test_vmap_folds.py) — the fastest single-chip
    # configuration a user can actually run
    tpu_e2e_vmap_s = tpu_ext_s + vmap_ms / 1000.0 * n_epochs_total
    emit("end_to_end_pipeline_vmapped", tpu_e2e_vmap_s, "s",
         cpu_e2e_s / tpu_e2e_vmap_s)
    # spread: the training term is device-bound and stable; the relay-bound
    # extraction term carries the weather, so the sum's min/max substitute
    # the extraction pass extremes for its median.  This decomposed SUM is
    # the round-2/3-comparable number (same composition those rounds used
    # for the headline).
    train_s = audio_ms / 1000.0 * n_epochs_total
    emit("end_to_end_pipeline_sum", tpu_e2e_s, "s", cpu_e2e_s / tpu_e2e_s,
         min_s=round(ext_stats["min_s"] + train_s, 2),
         max_s=round(ext_stats["max_s"] + train_s, 2),
         ext_median_s=round(tpu_ext_s, 2), train_s=round(train_s, 2))
    # both fused product configurations (measured early — see above)
    emit("end_to_end_pipeline_fused_vmapped", fused_v["median_s"], "s",
         cpu_e2e_s / fused_v["median_s"], passes=fused_v["passes"],
         min_s=round(fused_v["min_s"], 2),
         max_s=round(fused_v["max_s"], 2),
         warm_s=fused_v["warm_s"], pass_s=fused_v["pass_s"],
         timed_early=True)
    # HEADLINE (machine-checked, stays the LAST metric line): the fused
    # product path measured as one wall clock (extraction ->
    # device-resident fold data -> 3x169-epoch training -> metrics
    # readback) at the reference's serial-fold semantics; same workload
    # as the sum above, fewer relay round-trips.  The driver archives
    # only the output TAIL, so this line carries the session context the
    # earlier lines established (relay weather, extraction/serving/elmo
    # medians, the interleaved vmapped twin) — BENCH_r{N}.json is
    # self-contained even when truncated to this one line.
    speedup = cpu_e2e_s / fused["median_s"]
    emit("end_to_end_pipeline", fused["median_s"], "s", speedup,
         target=5.0, meets_target=bool(speedup >= 5.0),
         fused=True, timed_early=True, passes=fused["passes"],
         min_s=round(fused["min_s"], 2), max_s=round(fused["max_s"], 2),
         warm_s=fused["warm_s"], pass_s=fused["pass_s"],
         sum_path_s=round(tpu_e2e_s, 2), train_s=round(train_s, 2),
         vmapped={"median_s": round(fused_v["median_s"], 2),
                  "min_s": round(fused_v["min_s"], 2),
                  "max_s": round(fused_v["max_s"], 2),
                  "warm_s": fused_v["warm_s"]},
         weather={"roundtrip_s": wx["roundtrip_s"],
                  "up_mb_s": wx["up_mb_s"],
                  "down_mb_s": wx["down_mb_s"],
                  "probe_mb": wx["probe_mb"]},
         medians={"extraction_utt_s": round(tpu_utts, 1),
                  "serving_speakers_s": round(serve_sps, 2),
                  "elmo_sent_s": round(elmo_sps, 1),
                  "audio_clf_epoch_ms": round(audio_ms, 2),
                  "audio_clf_epoch_ms_vmapped": round(vmap_ms, 2)})

    print(f"# torch-cpu epochs ms: audio {audio_torch_ms:.0f}, "
          f"text {text_torch_ms:.0f}, fuse {fuse_torch_ms:.0f}, "
          f"reg {reg_torch_ms:.0f}; extraction baselines "
          f"(full-corpus extrapolated): numpy-oracle {np_ext_s:.1f}s "
          f"({np_utts:.0f} utt/s), reference-TF {ref_ext_s:.0f}s "
          f"({ref_utts:.2f} utt/s); conservative cpu e2e {cpu_e2e_s:.0f}s; "
          f"elmo steady {elmo_s:.2f}s/corpus vs torch-cpu biLSTMP "
          f"{elmo_torch_sps:.1f} sent/s", file=sys.stderr)


def scaling_child(epochs: int = 40, n_speakers: int = 486) -> None:
    """``--scaling``: virtual-mesh scaling evidence for the sharded
    whole-fold programs (SURVEY §5 distributed backend, *performance*).

    Forces CPU + 8 virtual XLA devices (the same substitute for a pod the
    tests use), inflates the synthetic corpus 3x, and times the SAME
    3-fold audio-clf workload four ways: serial folds, vmapped folds
    (1 device), fold-parallel (3 devices), fold x DP (3x2 = 6 devices).
    Each config is warmed (compile) then timed on a second full run.

    Interpretation depends on the host: with >= 3 real cores the
    fold-parallel wall-clock should approach 1/3 of serial (the sharded
    program runs folds concurrently); on a 1-core host (this sandbox) all
    virtual devices timeshare one core, so the expected signal is
    *parity* — equal wall-clock proves the sharded programs add no
    serialization or collective overhead beyond the compute itself.  The
    emitted lines carry ``host_cores`` so readers can tell which regime
    produced them.
    """
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8

    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.train import trainers

    cores = os.cpu_count() or 1
    tcfg = dataclasses.replace(C.AUDIO_CLF, epochs=epochs)
    features, targets = make_data(
        n=n_speakers, n_dep=int(n_speakers * N_DEP / N_SPEAKERS))
    tf = folds.generate_clf_folds(targets, 3, seed=0)

    def timed(**kw):
        trainers.train_audio_clf(features, targets, tf, tcfg, seed=0,
                                 **kw)   # warm: trace + compile
        t0 = time.time()
        trainers.train_audio_clf(features, targets, tf, tcfg, seed=0,
                                 **kw)
        return time.time() - t0

    serial_s = timed()
    configs = [
        ("fold_scaling_vmap", {"vmap_folds": True}, 1),
        ("fold_scaling_fold_parallel", {"fold_parallel": True}, 3),
        ("fold_scaling_fold_dp",
         {"fold_parallel": True, "data_parallel": 2}, 6),
    ]
    print(json.dumps({"metric": "fold_scaling_serial",
                      "value": round(serial_s, 2), "unit": "s",
                      "vs_baseline": 1.0, "devices": 1,
                      "host_cores": cores, "epochs": epochs,
                      "n_speakers": n_speakers}), flush=True)
    for name, kw, devices in configs:
        dt = timed(**kw)
        print(json.dumps({"metric": name, "value": round(dt, 2),
                          "unit": "s",
                          "vs_baseline": round(serial_s / dt, 2),
                          "devices": devices, "host_cores": cores}),
              flush=True)

    # TP biLM (parallel/elmo_tp.py) vs the serial LSTMP scan at a
    # reduced zhs-like geometry (cell/proj ratio preserved; full 4096
    # would take minutes per pass on one CPU core).  Same reading rule
    # as above: >= 4 real cores -> speedup toward 1/4 serial; 1 core ->
    # the gap over serial is the total TP price (per-step psum + copies).
    from icassp2022_depression_tpu.ops import rnn as rnn_ops
    from icassp2022_depression_tpu.parallel import elmo_tp
    from icassp2022_depression_tpu.parallel import mesh as mesh_mod

    cell, proj, din, b, t = 2048, 256, 256, 16, 32
    p = rnn_ops.init_lstmp(jax.random.PRNGKey(0), din, cell, proj)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, din))
    tp_mesh = mesh_mod.make_mesh(4, model_parallel=4)
    p_tp = elmo_tp.shard_lstmp_params(tp_mesh, p)

    def timed_lstmp(run):
        jax.block_until_ready(run())   # warm: trace + compile
        t0 = time.time()
        jax.block_until_ready(run())
        return time.time() - t0

    ser_s = timed_lstmp(lambda: rnn_ops.lstmp_layer(p, x, backend="xla"))
    tp_s = timed_lstmp(lambda: elmo_tp.lstmp_layer_tp(tp_mesh, p_tp, x))
    print(json.dumps({"metric": "elmo_tp_scaling_serial",
                      "value": round(ser_s, 3), "unit": "s",
                      "vs_baseline": 1.0, "devices": 1,
                      "host_cores": cores, "cell": cell, "proj": proj,
                      "batch": b, "t_steps": t}), flush=True)
    print(json.dumps({"metric": "elmo_tp_scaling_tp4",
                      "value": round(tp_s, 3), "unit": "s",
                      "vs_baseline": round(ser_s / tp_s, 2),
                      "devices": 4, "host_cores": cores}), flush=True)


def tf_baseline_child(n_utts: int) -> None:
    """Child mode (``--tf-baseline N``): run the reference-TF extraction
    baseline in this fresh process and print per-utterance times as the
    last stdout line."""
    wavs = make_wavs()
    per_utt = bench_extraction_reference_tf(wavs, max_utts=n_utts)
    print(json.dumps({"per_utt_s": per_utt}), flush=True)


def run_with_stall_watchdog(cmd=None) -> int:
    """Run the full benchmark in a CHILD process, restarting it (fresh
    process = fresh relay connection) if it stops producing output.

    The axon relay occasionally wedges a connection indefinitely (observed
    2026-08-17: a blocking device call slept >20 min at ~0% CPU while the
    identical command succeeded in minutes on retry).  A stalled attempt
    cannot be unblocked from inside the process, so the parent watches
    line output: no line for ``ICASSP_BENCH_STALL_S`` (default 900 s —
    cold compiles through the remote service legitimately take minutes)
    kills the child and retries up to ``ICASSP_BENCH_ATTEMPTS`` (2).
    Every child line streams through immediately, so the last stdout line
    stays the machine-checked ``end_to_end_pipeline`` JSON."""
    import os
    import selectors
    import subprocess

    attempts = int(os.environ.get("ICASSP_BENCH_ATTEMPTS", "2"))
    stall_s = float(os.environ.get("ICASSP_BENCH_STALL_S", "900"))
    if cmd is None:
        cmd = [sys.executable, __file__, "--inner"]
    for attempt in range(1, attempts + 1):
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True,
                                bufsize=1)
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        last_line = time.time()
        stalled = False
        while True:
            if sel.select(timeout=10):
                line = proc.stdout.readline()
                if line:
                    print(line, end="", flush=True)
                    last_line = time.time()
                elif proc.poll() is not None:
                    break
            elif proc.poll() is not None:
                break
            if time.time() - last_line > stall_s:
                stalled = True
                proc.kill()
                proc.wait()
                break
        if not stalled and proc.wait() == 0:
            return 0
        print(f"# bench attempt {attempt}/{attempts} "
              + ("stalled (no output for "
                 f"{stall_s:.0f}s — wedged relay connection?)" if stalled
                 else f"failed rc={proc.returncode}")
              + ("; retrying in a fresh process" if attempt < attempts
                 else ""), file=sys.stderr, flush=True)
    return 1


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--tf-baseline":
        # error loudly on a malformed count rather than silently falling
        # through to the full (TPU, ~minutes) benchmark
        if len(sys.argv) < 3 or not sys.argv[2].isdigit():
            sys.exit("usage: bench.py --tf-baseline N   (N = sample count)")
        tf_baseline_child(int(sys.argv[2]))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--scaling":
        if len(sys.argv) >= 3 and not sys.argv[2].isdigit():
            sys.exit("usage: bench.py --scaling [EPOCHS]")
        scaling_child(*([int(sys.argv[2])] if len(sys.argv) >= 3 else []))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--inner":
        main()
    else:
        sys.exit(run_with_stall_watchdog())

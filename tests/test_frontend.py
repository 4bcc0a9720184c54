"""Frontend pipelines end-to-end on synthetic corpora (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icassp2022_depression_tpu.data import eatd
from icassp2022_depression_tpu.frontend import audio as audio_fe
from icassp2022_depression_tpu.frontend import daic as daic_fe
from icassp2022_depression_tpu.frontend import text as text_fe
from icassp2022_depression_tpu.config import FrontendConfig
from icassp2022_depression_tpu.models import elmo, vggish


CFG = FrontendConfig()


def test_extract_batch_bucketing_matches_single(tmp_path):
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(n).astype(np.float32) * 1000
            for n in (5000, 17000, 5000)]
    feats = audio_fe.extract_batch(wavs, [16000] * 3, CFG)
    assert feats.shape == (3, 256)
    # per-utterance call with the matching ordinal reproduces the same row
    single = audio_fe.extract_batch([wavs[1]], [16000], CFG, start_ordinal=1)
    np.testing.assert_allclose(feats[1], single[0], atol=1e-5)


def test_bucketed_extraction_matches_direct_pipeline():
    """The padded-bucket path must equal running log-mel + NetVLAD on the
    raw unpadded waveform (librosa-style reflect padding at the TRUE signal
    end, not the bucket boundary)."""
    from icassp2022_depression_tpu.ops import mel, netvlad
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for n in (17000, 16384, 5000):
        w = (rng.standard_normal(n) * 2000).astype(np.float32)
        batched = audio_fe.extract_batch([np.round(w)], [16000], CFG)[0]
        lm = mel.log_mel(jnp.asarray(np.round(w)), sr=16000)
        nv = netvlad.per_utterance_params(CFG.netvlad_seed, 0, CFG.n_mels,
                                          CFG.netvlad_clusters,
                                          CFG.netvlad_output_dim)
        direct = np.asarray(netvlad.netvlad(nv, lm))
        np.testing.assert_allclose(batched, direct, atol=2e-4,
                                   err_msg=f"len={n}")


def test_extract_eatd_audio(tmp_path):
    eatd.make_synthetic_corpus(tmp_path, n_data=4, n_validation=2,
                               seconds=0.4, seed=0)
    feats, sds, clf, manifest = audio_fe.extract_eatd(
        tmp_path, CFG, out_dir=tmp_path / "Features" / "AudioWhole")
    assert feats.shape == (6, 3, 1, 256)
    assert len(manifest) == 6
    assert set(clf.tolist()) <= {0, 1}
    # reference npz layout roundtrip (squeeze axis=2 like the trainers)
    x, y = audio_fe.load_features(tmp_path / "Features" / "AudioWhole", "clf")
    assert x.shape == (6, 3, 256)
    np.testing.assert_array_equal(y, clf)
    # determinism
    feats2, _, _, _ = audio_fe.extract_eatd(tmp_path, CFG)
    np.testing.assert_array_equal(feats, feats2)


def test_incremental_extraction_resumes(tmp_path):
    """Incremental mode: an extended corpus pass reuses the cached
    per-speaker features and produces identical results to a full pass."""
    eatd.make_synthetic_corpus(tmp_path, n_data=3, n_validation=0,
                               seconds=0.3, seed=5)
    out = tmp_path / "Features" / "AudioWhole"
    f1, _, _, m1 = audio_fe.extract_eatd(tmp_path, CFG, out_dir=out,
                                         incremental=True)
    assert all(e["status"] == "ok" for e in m1)
    # add a 4th speaker and re-run incrementally
    eatd.make_synthetic_corpus(tmp_path / "_tmp", n_data=1, seconds=0.3,
                               n_validation=0, seed=9)
    import shutil
    shutil.move(str(tmp_path / "_tmp" / "Data" / "1"),
                str(tmp_path / "Data" / "4"))
    f2, _, _, m2 = audio_fe.extract_eatd(tmp_path, CFG, out_dir=out,
                                         incremental=True)
    assert [e["status"] for e in m2] == ["cached", "cached", "cached", "ok"]
    np.testing.assert_array_equal(f2[:3], f1)
    # full recompute gives identical features (ordinal keying is positional)
    f3, _, _, _ = audio_fe.extract_eatd(tmp_path, CFG)
    np.testing.assert_allclose(f2, f3, atol=1e-5)


def test_incremental_cache_invalidates_on_cfg_and_position(tmp_path):
    """Cache entries are fingerprinted: a changed frontend config or a
    corpus-layout change that shifts speaker positions (= NetVLAD
    ordinals) recomputes instead of silently reusing stale features."""
    import dataclasses
    import shutil

    eatd.make_synthetic_corpus(tmp_path, n_data=3, n_validation=0,
                               seconds=0.3, seed=6)
    out = tmp_path / "Features" / "AudioWhole"
    f1, _, _, m1 = audio_fe.extract_eatd(tmp_path, CFG, out_dir=out,
                                         incremental=True)
    assert all(e["status"] == "ok" for e in m1)

    # config change (different NetVLAD seed, same shapes): full recompute
    cfg2 = dataclasses.replace(CFG, netvlad_seed=CFG.netvlad_seed + 1)
    f2, _, _, m2 = audio_fe.extract_eatd(tmp_path, cfg2, out_dir=out,
                                         incremental=True)
    assert all(e["status"] == "ok" for e in m2)
    assert not np.allclose(f1, f2)
    # re-run under cfg2: now cached, identical
    f2b, _, _, m2b = audio_fe.extract_eatd(tmp_path, cfg2, out_dir=out,
                                           incremental=True)
    assert all(e["status"] == "cached" for e in m2b)
    np.testing.assert_array_equal(f2, f2b)

    # remove the FIRST speaker: every later speaker's position (and so
    # its utterance ordinals 3*position+k) shifts down -> shifted entries
    # recompute, matching a from-scratch pass over the new layout
    shutil.rmtree(tmp_path / "Data" / "1")
    f3, _, _, m3 = audio_fe.extract_eatd(tmp_path, cfg2, out_dir=out,
                                         incremental=True)
    assert len(m3) == 2
    assert all(e["status"] == "ok" for e in m3)  # all shifted -> recompute
    f4, _, _, _ = audio_fe.extract_eatd(tmp_path, cfg2)
    np.testing.assert_allclose(f3, f4, atol=1e-5)


def test_tokenize_fallback():
    toks = text_fe.fallback_segment("我今天 feels good 123")
    assert "我" in toks and "feels" in toks and "123" in toks
    assert text_fe.tokenize("") == []


def test_segmenter_registry_dispatch():
    # explicit names resolve; unknown names list the registry
    assert text_fe.get_segmenter("fallback") is text_fe.fallback_segment
    assert (text_fe.tokenize("我 今天x", segmenter="fallback")
            == ["我", "今", "天", "x"])
    with pytest.raises(ValueError, match="unknown segmenter"):
        text_fe.tokenize("x", segmenter="nope")
    # back-compat: use_jieba=False selects the fallback under 'auto'
    assert (text_fe.tokenize("我今天", use_jieba=False)
            == text_fe.tokenize("我今天", segmenter="fallback"))


def test_segmenter_registry_extension_point():
    """Third-party segmenters plug in by name (the reference's commented
    pkuseg/thulac/HanLP alternatives, text_features_whole.py:30-32)."""
    calls = []

    def fake(text):
        calls.append(text)
        return ["A", " ", "B "]  # whitespace-only token must be dropped

    text_fe.register_segmenter("fake-seg", fake)
    try:
        assert text_fe.tokenize("hello", segmenter="fake-seg") == ["A", "B "]
        assert calls == ["hello"]
    finally:
        del text_fe.SEGMENTERS["fake-seg"]


def test_extract_eatd_text_custom_segmenter(tmp_path, monkeypatch):
    """extract_eatd threads the segmenter through and records it in the
    provenance sidecar."""
    import json

    eatd.make_synthetic_corpus(tmp_path, n_data=2, n_validation=1,
                               seconds=0.1, seed=7)
    seen = []

    def spy(text):
        seen.append(text)
        return text_fe.fallback_segment(text)

    text_fe.register_segmenter("spy-seg", spy)
    try:
        cfg = elmo.ElmoConfig(vocab_size=128, embed_dim=8, hidden=8,
                              layers=1, output_dim=16)
        out = tmp_path / "feat"
        text_fe.extract_eatd(tmp_path, cfg=cfg, out_dir=out,
                             elmo_weights=None, segmenter="spy-seg")
        assert len(seen) == 3 * 3  # 3 speakers x 3 answers
        meta = json.loads((out / "extraction_meta.json").read_text())
        assert meta["segmenter"] == "spy-seg"
    finally:
        del text_fe.SEGMENTERS["spy-seg"]


def test_standin_warning_loud_and_suppressible(monkeypatch, capsys):
    """make_embedder prints an unmissable stderr banner when it falls back
    to the PRNG stand-in (the reference always uses pretrained zhs weights,
    text_features_whole.py:16) — and stays quiet with a converted bundle
    path or under the suppression env var."""
    cfg = elmo.ElmoConfig(vocab_size=64, embed_dim=8, hidden=8, layers=1,
                          output_dim=16)
    monkeypatch.delenv("ICASSP_SUPPRESS_STANDIN_WARNING", raising=False)
    monkeypatch.delenv("ICASSP_ELMO_WEIGHTS", raising=False)
    text_fe.make_embedder(cfg=cfg, elmo_weights=None)
    err = capsys.readouterr().err
    assert "WARNING" in err and "stand-in" in err
    assert "convert_elmo_zhs" in err

    # suppressed for test suites
    monkeypatch.setenv("ICASSP_SUPPRESS_STANDIN_WARNING", "1")
    text_fe.make_embedder(cfg=cfg, elmo_weights=None)
    assert capsys.readouterr().err == ""

    # explicit params are not the stand-in fallback: no banner
    monkeypatch.delenv("ICASSP_SUPPRESS_STANDIN_WARNING", raising=False)
    params = elmo.init(jax.random.PRNGKey(0), cfg)
    text_fe.make_embedder(params=params, cfg=cfg)
    assert capsys.readouterr().err == ""


def test_elmo_padding_invariance():
    cfg = elmo.ElmoConfig(vocab_size=128, embed_dim=8, hidden=8, layers=2)
    params = elmo.init(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 9, 3]], np.int32)
    ids_padded = np.array([[5, 9, 3, 0, 0, 0]], np.int32)
    _, p1 = elmo.encode(params, jnp.asarray(ids), jnp.asarray([3]), cfg)
    _, p2 = elmo.encode(params, jnp.asarray(ids_padded), jnp.asarray([3]), cfg)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_extract_eatd_text(tmp_path):
    eatd.make_synthetic_corpus(tmp_path, n_data=3, n_validation=1,
                               seconds=0.1, seed=1)
    cfg = elmo.ElmoConfig(vocab_size=512, embed_dim=16, hidden=16, layers=1,
                          output_dim=32)
    feats, sds, clf = text_fe.extract_eatd(
        tmp_path, cfg=cfg, out_dir=tmp_path / "Features" / "TextWhole")
    assert feats.shape == (4, 3, 32)
    x, y = text_fe.load_features(tmp_path / "Features" / "TextWhole", "reg")
    np.testing.assert_array_equal(x, feats)
    np.testing.assert_array_equal(y, sds)


def _make_daic(tmp_path, pid=300):
    d = tmp_path / f"{pid}_P"
    d.mkdir(parents=True)
    sr = 16000
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(sr * 6) * 3000)
    eatd.write_wav(d / f"{pid}_AUDIO.wav", wav, sr)
    rows = [
        "start_time\tstop_time\tspeaker\tvalue",
        "0.0\t0.5\tEllie\thow are you doing today",     # matching question
        "0.6\t1.4\tParticipant\tpretty good",
        "1.5\t1.8\tParticipant\tscrubbed_entry",         # skipped
        "2.0\t2.5\tEllie\twhat are you like when you don't sleep well",
        "2.6\t4.0\tParticipant\tnot great honestly",
        "4.2\t4.5\tEllie\ti think i have asked everything i need to",
    ]
    (d / f"{pid}_TRANSCRIPT.csv").write_text("\n".join(rows) + "\n")
    queries = tmp_path / "queries.txt"
    queries.write_text("how are you doing today\n"
                       "what are you like when you don't sleep well\n")
    split = tmp_path / "train_split.csv"
    split.write_text("Participant_ID,PHQ8_Binary,PHQ8_Score\n"
                     f"{pid},1,15\n")
    return queries, split


def test_daic_segmentation_and_extraction(tmp_path):
    queries_path, split_csv = _make_daic(tmp_path)
    queries = daic_fe.load_queries(queries_path)
    transcript = daic_fe.read_transcript(
        tmp_path / "300_P" / "300_TRANSCRIPT.csv")
    wave_data, sr = eatd.read_wav(tmp_path / "300_P" / "300_AUDIO.wav")
    signals = daic_fe.segment_responses(transcript, wave_data, sr, queries)
    # 2 responses: "pretty good" (scrubbed skipped) and "not great honestly"
    assert len(signals) == 2
    assert len(signals[0]) == int(1.4 * sr) - int(0.6 * sr)
    assert len(signals[1]) == int(4.0 * sr) - int(2.6 * sr)

    features, clabels, rlabels = daic_fe.extract_split(
        tmp_path, split_csv, queries_path, CFG,
        out_prefix=tmp_path / "Features", split_name="train")
    assert len(features) == 1 and features[0].shape == (2, 1, 256)
    assert clabels == [1] and rlabels == [15.0]
    dense, mask = daic_fe.pad_responses(features, max_responses=4)
    assert dense.shape == (1, 4, 256) and mask.sum() == 2


def test_daic_bundled_query_bank(tmp_path):
    """No hand-carried queries file: load_queries() defaults to the bundled
    323-line DAIC table and extract_split(queries_path=None) segments a
    real-format fixture whose Ellie lines come from that bank."""
    bank = daic_fe.load_queries()
    assert len(bank) == 324
    assert "how are you doing today" in bank
    assert "where are you from originally" in bank

    pid = 301
    d = tmp_path / f"{pid}_P"
    d.mkdir(parents=True)
    sr = 16000
    rng = np.random.default_rng(3)
    eatd.write_wav(d / f"{pid}_AUDIO.wav",
                   rng.standard_normal(sr * 5) * 3000, sr)
    rows = [
        "start_time\tstop_time\tspeaker\tvalue",
        "0.0\t0.5\tEllie\thow are you doing today",
        "0.6\t1.4\tParticipant\tfine thanks",
        "1.5\t2.0\tEllie\twhere are you from originally",
        "2.1\t3.0\tParticipant\tup north",
        "3.2\t3.5\tEllie\tokay i think i have asked everything i need to",
    ]
    (d / f"{pid}_TRANSCRIPT.csv").write_text("\n".join(rows) + "\n")
    split = tmp_path / "train_split.csv"
    split.write_text("Participant_ID,PHQ8_Binary,PHQ8_Score\n"
                     f"{pid},0,4\n")
    features, clabels, rlabels = daic_fe.extract_split(
        tmp_path, split, None, CFG)
    assert len(features) == 1 and features[0].shape == (2, 1, 256)
    assert clabels == [0] and rlabels == [4.0]


def test_vggish_pipeline():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(16000 * 2).astype(np.float32) * 8000
    examples = vggish.waveform_to_examples(wav, 16000)
    assert examples.shape[1:] == (96, 64)
    assert examples.shape[0] == 2  # two 0.96s examples in 2s
    params = vggish.init(jax.random.PRNGKey(0))
    emb = vggish.apply(params, jnp.asarray(examples))
    assert emb.shape == (2, 128)
    post = vggish.Postprocessor.random(jax.random.PRNGKey(1))
    q = post(np.asarray(emb))
    assert q.dtype == np.uint8
    out = vggish.to_vggish_embedds(params, wav, 16000, post)
    assert out.shape == (2, 128) and out.dtype == np.float32


def test_vggish_resample():
    x = np.sin(np.linspace(0, 100, 44100)).astype(np.float32)
    y = vggish.resample(x, 44100, 16000)
    assert abs(len(y) - 16000) <= 1


def test_flat_packed_extraction_boundary_lengths():
    """Fuzz the flat-packed transfer at the boundaries where packing
    could break: lengths at/around the frame size, the bucket size
    (tail room t_room < n_fft//2), 1-sample and tiny signals, mixed
    dtypes (int16 PCM + f32), and many utterances sharing one bucket —
    every row must equal the direct unpadded-pipeline oracle."""
    from icassp2022_depression_tpu.ops import mel, netvlad
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    # 1023/1024/1025 straddle the reflected-tail length (n_fft//2 = 1024):
    # multi-bounce (t_room > n-1), the exact single-bounce boundary
    # (t_room == n-1, the full w[n-2::-1] tail) and the common t_room < n-1
    lengths = [1, 2, 512, 1023, 1024, 1025, 2047, 2048, 2049, 15360,
               16383, 16384, 16385, 17000, 32768 - 100, 32768]
    wavs, srs = [], []
    for i, n in enumerate(lengths):
        w = np.round(rng.standard_normal(n) * 2000)
        # alternate int16 PCM and float32 rows (separate buckets)
        wavs.append(w.astype(np.int16) if i % 2 == 0
                    else w.astype(np.float32))
        srs.append(16000)
    feats = audio_fe.extract_batch(wavs, srs, CFG)
    assert feats.shape == (len(lengths), 256)
    for i, w in enumerate(wavs):
        lm = mel.log_mel(jnp.asarray(np.asarray(w, np.float32)), sr=16000)
        nv = netvlad.per_utterance_params(CFG.netvlad_seed, i, CFG.n_mels,
                                          CFG.netvlad_clusters,
                                          CFG.netvlad_output_dim)
        direct = np.asarray(netvlad.netvlad(nv, lm))
        np.testing.assert_allclose(feats[i], direct, atol=2e-4,
                                   err_msg=f"row {i} len={lengths[i]}")


def test_flat_transfer_byte_budget(monkeypatch):
    """Regression guard on the WIRE-BYTE invariant: every host->device
    array extract_batch ships is the true samples + reflected tails
    plus at most 12.5% quantization padding and one reserved row
    (`shapes.next_quantized` flat policy) — a return to pow2 flat
    lengths (or to shipping padded [B, L] rows) would double transfer
    time in bad relay weather and must fail here."""
    import jax.numpy as jnp_real

    from icassp2022_depression_tpu.utils import shapes

    shipped = []
    orig_asarray = jnp_real.asarray

    def spy_asarray(x, *a, **k):
        # tracer-safe: only inspect host ndarrays; int16 == the PCM wire
        if isinstance(x, np.ndarray) and x.dtype == np.int16:
            shipped.append(x.nbytes)
        return orig_asarray(x, *a, **k)

    monkeypatch.setattr(jnp_real, "asarray", spy_asarray)
    rng = np.random.default_rng(5)
    lengths = [int(16000 * s) for s in
               (3.0, 4.5, 5.2, 6.8, 2.2, 7.3, 3.9, 5.5)]
    wavs = [np.round(rng.standard_normal(n) * 2000).astype(np.float64)
            for n in lengths]
    audio_fe.extract_batch(wavs, [16000] * len(wavs), CFG)
    tail = CFG.n_fft // 2
    true_bytes = sum(2 * (n + tail) for n in lengths)    # int16 wire
    blens = {shapes.next_pow2(n + tail, minimum=16384) for n in lengths}
    # per-bucket ceiling: (payload + one reserved row) * 1.125 max padding
    budget = (true_bytes + 2 * sum(blens)) * 1.125
    total = sum(shipped)
    assert shipped, "no int16 wire arrays were shipped"
    assert total <= budget, (total, budget, shipped)


def test_extract_batch_rejects_int32_offset_overflow():
    """A batch whose flat stream exceeds int32 sample offsets must raise
    a clear error naming the fix (split the call), not corrupt offsets
    or crash with a numpy OverflowError.  Uses a broadcast view so the
    4 GB waveform costs no memory."""
    big = np.broadcast_to(np.zeros(1, np.int16), (2**31 - 100,))
    with pytest.raises(ValueError, match="int32"):
        audio_fe.extract_batch([big], [16000], CFG)


def test_extract_batch_empty_waveform_uses_silence_fallback():
    """A zero-length waveform gets the reference's 5 s 1e-4 silence
    fallback (audio_features_whole.py:105-110) instead of pooling a junk
    log-floor frame — serving feeds raw request audio straight in."""
    from icassp2022_depression_tpu.data import eatd

    empty = np.zeros(0, np.float32)
    got = audio_fe.extract_batch([empty], [16000], CFG)
    want = audio_fe.extract_batch([eatd.silence_fallback(16000)], [16000],
                                  CFG)
    np.testing.assert_allclose(got, want, atol=1e-6)

"""Command-line entry points.

The reference's "CLI" is ``python <script>.py`` with module-level side
effects (most scripts train at import — SURVEY.md §2).  Here every pipeline
stage is an explicit subcommand:

  python -m icassp2022_depression_tpu.cli synth-corpus --root ./corpus
  python -m icassp2022_depression_tpu.cli extract-audio --root ./corpus
  python -m icassp2022_depression_tpu.cli extract-text  --root ./corpus
  python -m icassp2022_depression_tpu.cli extract-daic  --daic-dir ... --split-csv ...
  python -m icassp2022_depression_tpu.cli train --task audio_clf --root ./corpus
  python -m icassp2022_depression_tpu.cli pipeline --track clf --root ./corpus
  python -m icassp2022_depression_tpu.cli baselines --task audio_clf --root ./corpus
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from pathlib import Path

import numpy as np


def _features_dirs(root: Path):
    return (root / "Features" / "AudioWhole", root / "Features" / "TextWhole")


def cmd_synth_corpus(args):
    from icassp2022_depression_tpu.data import eatd

    eatd.make_synthetic_corpus(Path(args.root), n_data=args.n_data,
                               n_validation=args.n_validation,
                               seconds=args.seconds, seed=args.seed)
    print(f"synthetic EATD-shaped corpus written to {args.root}")


def cmd_extract_audio(args):
    from icassp2022_depression_tpu.frontend import audio

    root = Path(args.root)
    out = Path(args.out) if args.out else root / "Features" / "AudioWhole"
    if args.embedder == "vggish":
        from icassp2022_depression_tpu.models import vggish

        params = post = None
        if args.vggish_ckpt:
            params = vggish.from_tf_checkpoint(args.vggish_ckpt)
        else:
            bundle = vggish.default_weights_path()
            if bundle is not None:   # converted-once bundle auto-loads,
                params, post = vggish.load_npz(bundle)   # like ELMo
                print(f"extract-audio: auto-loaded VGGish bundle {bundle}",
                      file=sys.stderr)
        if args.pca_params:          # explicit flag wins over bundle pca
            post = vggish.load_pca_params(args.pca_params)
        feats, sds, clf, manifest = audio.extract_eatd_vggish(
            root, params=params, postprocessor=post, out_dir=out)
    else:
        feats, sds, clf, manifest = audio.extract_eatd(root, out_dir=out)
    print(f"audio features {feats.shape} -> {out} "
          f"({len(manifest)} speakers, {int(clf.sum())} depressed)")


def cmd_extract_text(args):
    from icassp2022_depression_tpu.frontend import text

    root = Path(args.root)
    out = Path(args.out) if args.out else root / "Features" / "TextWhole"
    feats, sds, clf = text.extract_eatd(root, out_dir=out, seed=args.seed,
                                        elmo_weights=args.elmo_weights,
                                        elmo_stateful=args.elmo_stateful,
                                        segmenter=args.segmenter,
                                        elmo_tp=args.elmo_tp)
    print(f"text features {feats.shape} -> {out}")


def cmd_extract_daic(args):
    from icassp2022_depression_tpu.frontend import daic

    queries = Path(args.queries) if args.queries else None
    if args.multimodal:
        features, text_features, clabels, rlabels = \
            daic.extract_split_multimodal(
                Path(args.daic_dir), Path(args.split_csv),
                queries, out_prefix=Path(args.out),
                split_name=args.split_name, seed=args.seed,
                elmo_weights=args.elmo_weights,
                segmenter=args.segmenter, elmo_tp=args.elmo_tp)
    else:
        features, clabels, rlabels = daic.extract_split(
            Path(args.daic_dir), Path(args.split_csv), queries,
            out_prefix=Path(args.out), split_name=args.split_name)
    counts = [f.shape[0] for f in features]
    print(f"{len(features)} participants, responses per participant: "
          f"min {min(counts, default=0)} max {max(counts, default=0)} "
          f"-> {args.out}"
          + (" (+ text modality)" if args.multimodal else ""))


def cmd_train_daic(args):
    """Train on the AVEC2017 splits (the reference stops at extraction)."""
    from icassp2022_depression_tpu.frontend import daic as daic_fe
    from icassp2022_depression_tpu.train import daic as daic_train

    if args.daic_dir:
        # fused extract->train: the whole split's responses through ONE
        # device-resident extraction pass, padded ragged batches built by
        # on-device gathers — no npz artifacts, no feature readback
        if args.multimodal:
            raise SystemExit("--daic-dir (fused extract->train) is "
                             "audio-only — the text modality needs the "
                             "ELMo pipeline's artifacts (extract-daic "
                             "--multimodal first, then --features)")
        if not (args.train_csv and args.eval_csv):
            raise SystemExit("--daic-dir requires --train-csv and "
                             "--eval-csv (AVEC2017 split files)")
        if args.features:
            raise SystemExit("--daic-dir and --features are mutually "
                             "exclusive (fused vs persisted-npz path)")
        queries = Path(args.queries) if args.queries else None
        tr, cl_tr, rl_tr = daic_fe.extract_split_device(
            Path(args.daic_dir), Path(args.train_csv), queries)
        te, cl_te, rl_te = daic_fe.extract_split_device(
            Path(args.daic_dir), Path(args.eval_csv), queries)
        # missing session dirs are silently skipped (reference semantics);
        # a fully-empty split means the CSV ids match nothing — training
        # on it would emit junk metrics, so fail loudly instead
        for split, labels, csv in (("train", cl_tr, args.train_csv),
                                   ("eval", cl_te, args.eval_csv)):
            if len(labels) == 0:
                raise SystemExit(
                    f"--daic-dir {args.daic_dir}: no participants "
                    f"extracted for the {split} split ({csv}) — check "
                    "the CSV's Participant_ID column against the "
                    "<id>_P/ session dirs")
        x_tr, x_te = tr, te
        y_tr, y_te = ((cl_tr, cl_te) if args.track == "clf"
                      else (rl_tr, rl_te))
        dim = int(tr.flat.shape[-1])
        _finish_train_daic(args, daic_train, x_tr, y_tr, x_te, y_te, dim,
                           meta_extras=None)
        return

    if not args.features:
        raise SystemExit("train-daic needs --features (persisted npz "
                         "prefix) or --daic-dir (fused extract->train)")
    prefix = Path(args.features)
    if args.multimodal:
        xa_tr, xt_tr, y_tr = daic_fe.load_features(prefix, "train",
                                                   args.track, True)
        xa_te, xt_te, y_te = daic_fe.load_features(prefix, args.eval_split,
                                                   args.track, True)
        x_tr = daic_train.concat_multimodal(xa_tr, xt_tr)
        x_te = daic_train.concat_multimodal(xa_te, xt_te)
        dim = x_tr[0].shape[-1] if x_tr else 0
    else:
        x_tr, y_tr = daic_fe.load_features(prefix, "train", args.track)
        x_te, y_te = daic_fe.load_features(prefix, args.eval_split,
                                           args.track)
        dim = x_tr[0].shape[-1] if x_tr else 0
    meta_extras = None
    if args.multimodal:
        # text-modality provenance from extract-daic's sidecar ->
        # checkpoint sidecar (DaicPredictor adopts segmenter/seed and
        # checks the embedder id, like the EATD text tasks)
        meta_p = prefix / "extraction_meta.json"
        if meta_p.exists():
            m = json.loads(meta_p.read_text())
            meta_extras = {"text_embedder": m.get("embedder"),
                           "text_segmenter": m.get("segmenter"),
                           "text_seed": m.get("seed")}
    _finish_train_daic(args, daic_train, x_tr, y_tr, x_te, y_te, dim,
                       meta_extras)


def _finish_train_daic(args, daic_train, x_tr, y_tr, x_te, y_te, dim,
                       meta_extras):
    from icassp2022_depression_tpu import config as C

    base = (daic_train.DAIC_CLF if args.track == "clf"
            else daic_train.DAIC_REG)
    tcfg = C.replace(base, model=C.replace(base.model, embedding_size=dim))
    out_dir = Path(args.model_dir) if args.model_dir else None
    result = daic_train.train_daic(x_tr, y_tr, x_te, y_te, tcfg,
                                   out_dir=out_dir, seed=args.seed,
                                   meta_extras=meta_extras)
    best = {k: round(v, 4) for k, v in result["best"].items()
            if k != "params"}
    print(json.dumps(best))
    return 0


def cmd_check_daic(args):
    """L5 symmetry for DAIC: recompute a checkpoint's eval-split metrics
    (the EATD tracks' ``check`` counterpart)."""
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.frontend import daic as daic_fe
    from icassp2022_depression_tpu.train import daic as daic_train

    if getattr(args, "daic_dir", None):
        # no-npz loop closure for train-daic --daic-dir checkpoints:
        # re-extract the eval split on the fly (same math, per-split
        # cumulative ordinals from 0 — matching the fused training pass)
        if args.multimodal:
            raise SystemExit("--daic-dir re-extraction is audio-only "
                             "(multimodal needs extract-daic --multimodal "
                             "artifacts via --features)")
        if not args.eval_csv:
            raise SystemExit("--daic-dir requires --eval-csv")
        if args.features:
            raise SystemExit("--daic-dir and --features are mutually "
                             "exclusive")
        if args.eval_split is not None:
            raise SystemExit("--eval-split names a persisted npz split "
                             "and has no effect with --daic-dir (the "
                             "--eval-csv file alone selects the split)")
        queries = Path(args.queries) if args.queries else None
        x, cl, rl = daic_fe.extract_split(Path(args.daic_dir),
                                          Path(args.eval_csv), queries)
        y = cl if args.track == "clf" else rl
    elif args.features:
        if args.queries:
            raise SystemExit("--queries only applies to --daic-dir "
                             "re-extraction (persisted npz features are "
                             "already segmented)")
        prefix = Path(args.features)
        eval_split = args.eval_split or "test"
        if args.multimodal:
            xa, xt, y = daic_fe.load_features(prefix, eval_split,
                                              args.track, True)
            x = daic_train.concat_multimodal(xa, xt)
        else:
            x, y = daic_fe.load_features(prefix, eval_split, args.track)
    else:
        raise SystemExit("check-daic needs --features (persisted npz "
                         "prefix) or --daic-dir + --eval-csv")
    dim = x[0].shape[-1] if x else 0
    base = (daic_train.DAIC_CLF if args.track == "clf"
            else daic_train.DAIC_REG)
    tcfg = C.replace(base, model=C.replace(base.model, embedding_size=dim))
    out = daic_train.check_daic(x, y, args.ckpt, tcfg)
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    return 0


def cmd_check_cross(args):
    """Cross-corpus checking: an EATD-trained audio model on DAIC-WOZ.

    The reference ships the DAIC frontend for exactly this purpose
    (``DAICFeatureExtarction/``, BASELINE config 5) but no evaluation
    harness — its EATD models consume 3 utterances/speaker while DAIC
    yields a variable response count.  ``eval/cross_corpus.py`` bridges
    the shape gap (windows of 3, soft-voted); this subcommand is its
    product surface, the ``check``/``check-daic`` sibling."""
    import jax

    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.eval import cross_corpus
    from icassp2022_depression_tpu.frontend import daic as daic_fe
    from icassp2022_depression_tpu.models import audio_net, porting

    if getattr(args, "daic_dir", None):
        if not args.eval_csv:
            raise SystemExit("--daic-dir requires --eval-csv")
        if args.features:
            raise SystemExit("--daic-dir and --features are mutually "
                             "exclusive")
        queries = Path(args.queries) if args.queries else None
        x, cl, rl = daic_fe.extract_split(Path(args.daic_dir),
                                          Path(args.eval_csv), queries)
        y = cl if args.track == "clf" else rl
    elif args.features:
        if args.queries:
            raise SystemExit("--queries only applies to --daic-dir "
                             "re-extraction")
        x, y = daic_fe.load_features(Path(args.features),
                                     args.eval_split or "test", args.track)
    else:
        raise SystemExit("check-cross needs --features (extract-daic npz "
                         "prefix) or --daic-dir + --eval-csv")
    base = C.AUDIO_CLF if args.track == "clf" else C.AUDIO_REG
    mcfg = C.replace(base.model, embedding_size=args.audio_dim)
    dim = int(x[0].shape[-1]) if len(x) else mcfg.embedding_size
    if dim != mcfg.embedding_size:
        raise SystemExit(
            f"DAIC feature dim {dim} != the EATD audio model's "
            f"embedding_size {mcfg.embedding_size} — check-cross evaluates "
            "EATD-trained AUDIO checkpoints on DAIC audio features; pass "
            "--audio-dim to match the checkpoint's training features "
            "(e.g. 128 for vggish)")
    template = audio_net.init(jax.random.PRNGKey(0), mcfg)
    params = porting.load_params(args.ckpt, "audio", mcfg, template)
    if args.track == "clf":
        out = cross_corpus.evaluate_clf(params, x, y, mcfg)
    else:
        out = cross_corpus.evaluate_reg(params, x, y, mcfg)
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    return 0


def _load_clf_inputs(root: Path):
    from icassp2022_depression_tpu.frontend import audio as afe
    from icassp2022_depression_tpu.frontend import text as tfe

    audio_dir, text_dir = _features_dirs(root)
    xa, ya = afe.load_features(audio_dir, "clf")
    xt, yt = tfe.load_features(text_dir, "clf")
    return xa, ya, xt, yt


def _require_features(path: Path, kind: str):
    if not path.exists():
        raise SystemExit(
            f"{kind} features not found under {path} — run "
            f"`extract-{kind}` (or point --root at a directory with "
            "Features/AudioWhole and Features/TextWhole)")


def _require_speakers(features, corpus) -> None:
    """Fused --corpus paths must find at least one speaker: training or
    checking against a zero-speaker extraction would silently emit junk
    metrics (the reference hard-fails on a missing corpus too — its
    trainers ``np.load`` artifacts that could never have been written,
    e.g. ``audio_gru_whole.py:19``)."""
    if len(features) == 0:
        raise SystemExit(
            f"--corpus {corpus}: no speakers found — expected EATD layout "
            "Data/<n>/ and/or ValidationData/<n>/ containing "
            "{positive,neutral,negative}_out.wav (+ transcripts) and "
            "new_label.txt (see `synth-corpus` for a runnable example)")


def _warn_stale_text_artifacts(text_dir: Path) -> None:
    """A fused --corpus run re-extracts text ON THE FLY; if extract-text
    artifacts exist (possibly produced with different embedder settings)
    say loudly that they are NOT being used."""
    if (text_dir / "whole_samples_clf_avg.npz").exists():
        print("--corpus: ignoring the existing extract-text artifacts in "
              f"{text_dir} — text features are re-extracted on the fly "
              "with THIS command's --seed/--segmenter/--elmo-weights "
              "(drop --corpus to train on the persisted npz instead)",
              file=sys.stderr)


def _text_meta(text_dir: Path):
    """Embedder provenance recorded by extract-text -> checkpoint sidecar
    extras (a text/fusion model is only servable with the embedder whose
    features it was trained on)."""
    p = text_dir / "extraction_meta.json"
    if p.exists():
        meta = json.loads(p.read_text())
        extras = {"text_embedder": meta.get("embedder")}
        if meta.get("segmenter"):
            extras["text_segmenter"] = meta["segmenter"]
        return extras
    return None


def _train_folds(root: Path, targets, seed: int, idx_files=None):
    from icassp2022_depression_tpu.data import folds

    if idx_files:
        return [folds.load_index_file(p) for p in idx_files]
    return folds.generate_clf_folds(targets, 3, seed=seed)


def cmd_train(args):
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.frontend import audio as afe
    from icassp2022_depression_tpu.frontend import text as tfe
    from icassp2022_depression_tpu.train import trainers
    from icassp2022_depression_tpu.utils.logging import MetricsLogger

    root = Path(args.root)
    audio_dir, text_dir = _features_dirs(root)
    model_dir = Path(args.model_dir) if args.model_dir else root / "Model"
    logger = MetricsLogger(model_dir / f"{args.task}_metrics.jsonl",
                           echo=args.verbose)

    resume_kw = {}
    if args.resume_dir:
        resume_kw = {"resume_dir": Path(args.resume_dir),
                     "chunk_epochs": args.chunk_epochs}
    if args.data_parallel > 1 and not args.fold_parallel:
        raise SystemExit("--data-parallel requires --fold-parallel "
                         "(it shards each fold's batch over that fold's "
                         "device group)")
    if args.vmap_folds or args.fold_parallel:
        resume_kw.update(vmap_folds=args.vmap_folds or args.fold_parallel,
                         fold_parallel=args.fold_parallel,
                         data_parallel=args.data_parallel)
    # "" (e.g. an unset shell var) means "no fused corpus", same as absent
    corpus = getattr(args, "corpus", None) or None
    if corpus and args.task.startswith("audio") and args.audio_dim != 256:
        raise SystemExit("--corpus always extracts 256-d wav2vlad "
                         "features; --audio-dim must stay 256")
    if not corpus:
        _require_features(audio_dir if args.task.startswith("audio")
                          else text_dir,
                          "audio" if args.task.startswith("audio")
                          else "text")
    if args.task.startswith("audio") and args.audio_dim != 256:
        # alternative-embedder features (e.g. extract-audio --embedder
        # vggish writes 128-d rows): load the matching npz dim and widen/
        # narrow the model's input layer to it
        base = C.AUDIO_CLF if args.task.endswith("clf") else C.AUDIO_REG
        resume_kw["tcfg"] = C.replace(
            base, model=C.replace(base.model,
                                  embedding_size=args.audio_dim))
    else:
        # resolve the preset AT CALL TIME: the trainers' keyword defaults
        # bind whatever C.<PRESET> was at import, so runtime changes to
        # the config module (tests, notebooks) would silently be ignored
        resume_kw["tcfg"] = {"audio_clf": C.AUDIO_CLF,
                             "text_clf": C.TEXT_CLF,
                             "audio_reg": C.AUDIO_REG,
                             "text_reg": C.TEXT_REG}[args.task]
    corpus_feats = corpus_text_meta = None
    if corpus:
        # fused extract->train: device-resident features, no npz artifacts
        # and no feature readback — one upload, one metrics readback
        if args.task.startswith("audio"):
            corpus_feats, corpus_sds, corpus_clf = afe.extract_eatd_device(
                Path(corpus))
            _require_speakers(corpus_sds, corpus)
        else:
            # text twin: embedder resolution (converted bundle via auto /
            # PRNG stand-in) and provenance exactly as extract-text's;
            # --seed/--segmenter/--elmo-weights thread through so a fused
            # run reproduces the two-step run at the same settings
            _warn_stale_text_artifacts(text_dir)
            corpus_feats, corpus_sds, corpus_clf, meta = \
                tfe.extract_eatd_device(Path(corpus), seed=args.seed,
                                        elmo_weights=args.elmo_weights,
                                        segmenter=args.segmenter)
            _require_speakers(corpus_sds, corpus)
            corpus_text_meta = {"text_embedder": meta.get("embedder"),
                                "text_segmenter": meta.get("segmenter")}
    if args.task in ("audio_clf", "text_clf"):
        if args.task == "audio_clf":
            if corpus is not None:
                x, y = corpus_feats, corpus_clf
            else:
                x, y = afe.load_features(audio_dir, "clf",
                                         dim=args.audio_dim)
            fn, sub = trainers.train_audio_clf, "ClassificationWhole/Audio"
        else:
            if corpus is not None:
                x, y = corpus_feats, corpus_clf
            else:
                x, y = tfe.load_features(text_dir, "clf")
            fn, sub = trainers.train_text_clf, "ClassificationWhole/Text"
        tf_idx = _train_folds(root, y, args.seed, args.idx_files)
        if args.task == "text_clf":
            resume_kw["meta_extras"] = (corpus_text_meta if corpus
                                        else _text_meta(text_dir))
        results = fn(x, y, tf_idx, out_dir=model_dir / sub, seed=args.seed,
                     **resume_kw)
    elif args.task in ("audio_reg", "text_reg"):
        if args.task == "audio_reg":
            if corpus is not None:
                x, y = corpus_feats, corpus_sds
            else:
                x, y = afe.load_features(audio_dir, "reg",
                                         dim=args.audio_dim)
            fn, sub = trainers.train_audio_reg, "Regression"
        else:
            if corpus is not None:
                x, y = corpus_feats, corpus_sds
            else:
                x, y = tfe.load_features(text_dir, "reg")
            fn, sub = trainers.train_text_reg, "Regression"
        dep, non = folds.generate_reg_shuffles(y, seed=args.seed)
        if args.task == "text_reg":
            resume_kw["meta_extras"] = (corpus_text_meta if corpus
                                        else _text_meta(text_dir))
        results = fn(x, y, dep, non, out_dir=model_dir / sub, seed=args.seed,
                     **resume_kw)
    else:
        print(f"use the 'pipeline' command for fusion tasks ({args.task})",
              file=sys.stderr)
        return 2

    for r in results:
        logger.log_fold(args.task, r["fold"], r["logs"], r["best"])
        best = {k: round(v, 4) for k, v in r["best"].items() if k != "params"}
        print(f"fold {r['fold']}: {best}")
    return 0


def _warn_ungated(named_results):
    """The reference fails loudly when a branch checkpoint is missing
    (torch.load of a nonexistent path); here the fusion stage would
    silently inherit a fold's *initial random* branch params if its gate
    never fired — warn explicitly instead."""
    for name, results in named_results.items():
        bad = [r["fold"] for r in results if r["best"]["epoch"] < 0]
        if bad:
            print(f"WARNING: {name} gate never fired for fold(s) {bad}; "
                  "fusion will start those folds from UNTRAINED branch "
                  "params (reference behaviour: missing checkpoint -> "
                  "hard failure)", file=sys.stderr)


def cmd_pipeline(args):
    """Full track: branch trainers -> fusion with branch init."""
    _pipeline_summary(args)
    return 0


def _pipeline_summary(args) -> dict:
    """Pipeline body; returns the per-task fold-metric summary (also
    printed as the final JSON line)."""
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.frontend import audio as afe
    from icassp2022_depression_tpu.frontend import text as tfe
    from icassp2022_depression_tpu.train import trainers

    from icassp2022_depression_tpu.utils.logging import MetricsLogger

    root = Path(args.root)
    audio_dir, text_dir = _features_dirs(root)
    model_dir = Path(args.model_dir) if args.model_dir else root / "Model"
    logger = MetricsLogger(model_dir / f"pipeline_{args.track}_metrics.jsonl")

    def _lr(tcfg):
        if not args.lr:
            return tcfg
        return C.replace(tcfg, optimizer=C.replace(tcfg.optimizer,
                                                   learning_rate=args.lr))

    fold_kw = {}
    if args.vmap_folds or args.fold_parallel:
        fold_kw = {"vmap_folds": True, "fold_parallel": args.fold_parallel}

    # "" (e.g. an unset shell var) means "no fused corpus", same as absent
    corpus = getattr(args, "corpus", None) or None
    corpus_feats = corpus_sds = corpus_clf = None
    corpus_text = text_meta = None
    if corpus:
        # fully fused track: BOTH modalities extracted device-resident
        # (wav2vlad audio + the resolved ELMo embedder) feed every
        # trainer directly — a raw corpus runs the whole reference
        # pipeline with zero persisted feature artifacts
        _warn_stale_text_artifacts(text_dir)
        corpus_feats, corpus_sds, corpus_clf = afe.extract_eatd_device(
            Path(corpus))
        _require_speakers(corpus_sds, corpus)
        corpus_text, _, _, tmeta = tfe.extract_eatd_device(
            Path(corpus), seed=args.seed, elmo_weights=args.elmo_weights,
            segmenter=args.segmenter)
        text_meta = {"text_embedder": tmeta.get("embedder"),
                     "text_segmenter": tmeta.get("segmenter")}
    else:
        _require_features(audio_dir, "audio")
        _require_features(text_dir, "text")
        text_meta = _text_meta(text_dir)
    if args.track == "clf":
        if corpus is not None:
            xa, ya = corpus_feats, corpus_clf
            xt, yt = corpus_text, corpus_clf
        else:
            xa, ya = afe.load_features(audio_dir, "clf")
            xt, yt = tfe.load_features(text_dir, "clf")
        tf_idx = _train_folds(root, ya, args.seed, args.idx_files)
        ra = trainers.train_audio_clf(xa, ya, tf_idx, _lr(C.AUDIO_CLF),
                                      out_dir=model_dir / "ClassificationWhole/Audio",
                                      seed=args.seed, **fold_kw)
        rt = trainers.train_text_clf(xt, yt, tf_idx, _lr(C.TEXT_CLF),
                                     out_dir=model_dir / "ClassificationWhole/Text",
                                     seed=args.seed,
                                     meta_extras=text_meta,
                                     **fold_kw)
        _warn_ungated({"audio_clf": ra, "text_clf": rt})
        branch = [(rt[i]["best"]["params"], ra[i]["best"]["params"])
                  for i in range(len(ra))]
        rf = trainers.train_fuse_clf(xa, xt, ya, tf_idx, branch,
                                     tcfg=_lr(C.FUSE_CLF_TRAINER),
                                     out_dir=model_dir / "ClassificationWhole/Fuse",
                                     seed=args.seed,
                                     meta_extras=text_meta)
        for name, results in (("audio_clf", ra), ("text_clf", rt),
                              ("fuse_clf", rf)):
            for r in results:
                logger.log_fold(name, r["fold"], r["logs"], r["best"])
        summary = {
            "audio_f1": [r["best"]["f1"] for r in ra],
            "text_f1": [r["best"]["f1"] for r in rt],
            "fuse_f1": [r["best"]["f1"] for r in rf],
        }
    else:
        if corpus is not None:
            xa, ya = corpus_feats, corpus_sds
            xt, yt = corpus_text, corpus_sds
        else:
            xa, ya = afe.load_features(audio_dir, "reg")
            xt, yt = tfe.load_features(text_dir, "reg")
        dep, non = folds.generate_reg_shuffles(ya, seed=args.seed)
        ra = trainers.train_audio_reg(xa, ya, dep, non, _lr(C.AUDIO_REG),
                                      out_dir=model_dir / "Regression",
                                      seed=args.seed, **fold_kw)
        rt = trainers.train_text_reg(xt, yt, dep, non, _lr(C.TEXT_REG),
                                     out_dir=model_dir / "Regression",
                                     seed=args.seed,
                                     meta_extras=text_meta,
                                     **fold_kw)
        _warn_ungated({"audio_reg": ra, "text_reg": rt})
        branch = [(rt[i]["best"]["params"], ra[i]["best"]["params"])
                  for i in range(len(ra))]
        rf = trainers.train_fuse_reg(xa, xt, ya, dep, non, branch,
                                     tcfg=_lr(C.FUSE_REG_TRAINER),
                                     out_dir=model_dir / "Regression",
                                     seed=args.seed,
                                     meta_extras=text_meta,
                                     **fold_kw)
        for name, results in (("audio_reg", ra), ("text_reg", rt),
                              ("fuse_reg", rf)):
            for r in results:
                logger.log_fold(name, r["fold"], r["logs"], r["best"])
        summary = {
            "audio_mae": [r["best"]["mae"] for r in ra],
            "text_mae": [r["best"]["mae"] for r in rt],
            "fuse_mae": [r["best"]["mae"] for r in rf],
        }
    print(json.dumps({k: [round(float(v), 4) for v in vs]
                      for k, vs in summary.items()}))
    return summary


def cmd_check(args):
    """ModelChecking equivalents: recompute fold metrics from checkpoints."""
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.eval import checking
    from icassp2022_depression_tpu.frontend import audio as afe
    from icassp2022_depression_tpu.frontend import text as tfe

    root = Path(args.root)
    audio_dir, text_dir = _features_dirs(root)
    ckpts = [Path(p) for p in args.ckpts]
    # "" (unset shell var) means "no corpus", same as absent
    corpus = getattr(args, "corpus", None) or None
    if corpus:
        # no-npz loop closure for `train/pipeline --corpus`-produced
        # checkpoints: re-extract BOTH feature sets on the fly instead of
        # requiring the persisted artifacts (same math/ordinals/embedder
        # resolution, so checkpoints reproduce exactly)
        if args.task.startswith(("audio", "fuse")) or args.task.endswith(
                "reg"):  # every task except text_clf needs the audio side
            cfeat, csds, cclf, _ = afe.extract_eatd(Path(corpus))
            _require_speakers(csds, corpus)
            cfeat = np.squeeze(cfeat, axis=2)
        if args.task.startswith(("text", "fuse")):
            tfeat, tsds, tclf = tfe.extract_eatd(
                Path(corpus), seed=args.seed,
                elmo_weights=args.elmo_weights, segmenter=args.segmenter)

    def _audio(track):
        if corpus is not None:
            return cfeat, (cclf if track == "clf" else csds)
        return afe.load_features(audio_dir, track)

    def _text(track):
        if corpus is not None:
            return tfeat, (tclf if track == "clf" else tsds)
        return tfe.load_features(text_dir, track)

    if args.task == "audio_clf":
        x, y = _audio("clf")
        tf_idx = _train_folds(root, y, args.seed, args.idx_files)
        results, summary = checking.check_audio_clf(x, y, tf_idx, ckpts)
    elif args.task == "text_clf":
        x, y = _text("clf")
        tf_idx = _train_folds(root, y, args.seed, args.idx_files)
        results, summary = checking.check_text_clf(x, y, tf_idx, ckpts)
    elif args.task == "fuse_clf":
        xa, ya = _audio("clf")
        xt, _ = _text("clf")
        tf_idx = _train_folds(root, ya, args.seed, args.idx_files)
        results, summary = checking.check_fuse_clf(xa, xt, ya, tf_idx, ckpts)
    elif args.task in ("audio_reg", "text_reg", "fuse_reg"):
        xa, ya = _audio("reg")
        dep, non = folds.generate_reg_shuffles(ya, seed=args.seed)
        if args.task == "audio_reg":
            results, summary = checking.check_audio_reg(xa, ya, dep, non, ckpts)
        elif args.task == "text_reg":
            xt, yt = _text("reg")
            results, summary = checking.check_text_reg(xt, yt, dep, non, ckpts)
        else:
            xt, _ = _text("reg")
            results, summary = checking.check_fuse_reg(xa, xt, ya, dep, non,
                                                       ckpts)
    else:
        raise SystemExit(f"unknown task {args.task}")
    for r in results:
        print(json.dumps({k: v for k, v in r.items()
                          if k != "confusion_matrix"}))
    print(json.dumps({"mean": summary}))
    return 0


def cmd_export_pt(args):
    """Export one of our checkpoints as a reference-layout torch ``.pt``.

    The reverse migration direction: a model trained here validates in the
    reference's own torch harness via the standard two-liner
    (``m = AudioBiLSTM(...); m.load_state_dict(torch.load(out))``).  The
    input may be our ``.npz`` checkpoint or an already-reference ``.pt``
    (whole-module or state-dict) — both resolve through
    ``porting.load_params``."""
    import jax

    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.models import (audio_net, fusion, porting,
                                                  text_net)

    task = args.task
    if task.startswith("fuse"):
        kind, mcfg = "fusion", C.FUSION_PRESETS[task]
        template = fusion.init(jax.random.PRNGKey(0), mcfg)
    else:
        kind = "audio" if task.startswith("audio") else "text"
        mcfg = C.PRESETS[task].model
        module = audio_net if kind == "audio" else text_net
        template = module.init(jax.random.PRNGKey(0), mcfg)
    params = porting.load_params(args.ckpt, kind, mcfg, template)
    sd = porting.export_reference_pt(params, kind, mcfg, args.out)
    print(json.dumps({"exported": str(args.out), "task": task,
                      "kind": kind, "tensors": len(sd)}))
    return 0


#: reference real-corpus metric bands (BASELINE.md; checkpoint-name
#: evidence — two ckpt sets per branch task where the repo records both)
PARITY_BANDS = {
    "audio_f1": (0.60, 0.67), "text_f1": (0.62, 0.67),
    "fuse_f1": (0.62, 0.69),
    "audio_mae": (7.60, 8.38), "text_mae": (7.75, 8.46),
}


def check_parity_bands(report: dict):
    """Pure band check: fold-metric report -> (rc, rows).

    Each row is ``(key, vals, mean, (lo, hi), in_band)``.  F1 means must
    land within +/-0.05 of the reference band; MAE means at most 0.5 above
    the band's high end (lower is strictly better).  rc is the exit code
    the driver consumes: 0 = every reported metric in band, 1 otherwise.
    """
    rc = 0
    rows = []
    for key, band in PARITY_BANDS.items():
        vals = report.get(key)
        if not vals:
            continue
        mean = sum(vals) / len(vals)
        lo, hi = band
        in_band = lo - 0.05 <= mean <= hi + 0.05 if "f1" in key else \
            mean <= hi + 0.5
        rows.append((key, vals, mean, band, in_band))
        if not in_band:
            rc = 1
    return rc, rows


#: BASELINE.md table rows: (report key, metric label, reference fold
#: values per published checkpoint set, source file:line under
#: /root/reference/DepressionCollected/).  fuse_mae has no published
#: per-fold values — only the save floor — so it reports informationally.
PARITY_TABLE_ROWS = (
    ("audio_f1", "Audio GRU clf F1, 3 folds",
     ((0.67, 0.67, 0.63), (0.63, 0.65, 0.60)),
     "Classification/fuse_net_whole.py:525; FuseModelChecking.py:11"),
    ("text_f1", "Text BiLSTM clf F1, 3 folds",
     ((0.64, 0.66, 0.62), (0.67, 0.66, 0.66)),
     "Classification/fuse_net_whole.py:524; FuseModelChecking.py:10"),
    ("fuse_f1", "Fusion clf F1, 3 folds", ((0.69, 0.68, 0.62),),
     "Classification/FuseModelChecking.py:12"),
    ("audio_mae", "Audio reg SDS MAE, 3 folds", ((7.60, 8.38, 8.25),),
     "Regression/fuse_net.py:34"),
    ("text_mae", "Text reg SDS MAE, 3 folds", ((7.75, 8.46, 8.01),),
     "Regression/fuse_net.py:33"),
    ("fuse_mae", "Fusion reg SDS MAE (save floor < 8.2)", None,
     "Regression/fuse_net.py:448"),
)


def _fmt_folds(vals) -> str:
    """BASELINE.md value style: ``0.69 / 0.68 / 0.62 (mean ~ 0.663)``."""
    mean = sum(vals) / len(vals)
    return (" / ".join(f"{v:.2f}" for v in vals)
            + f" (mean ≈ {mean:.3f})")


def parity_report_markdown(report: dict, band_rows=None) -> str:
    """Render a fold-metric report as the BASELINE.md-format acceptance
    table: one row per published reference metric with this build's
    per-fold values + mean side-by-side with the reference's, and a
    PASS/FLAG status from :func:`check_parity_bands`'s rules (rows
    without a band — fuse_mae — report ``info``).  Missing report keys
    render as ``(not measured)`` so a partial run still yields the full
    checklist.  ``band_rows`` passes a precomputed
    :func:`check_parity_bands` result so callers evaluate the bands
    exactly once."""
    if band_rows is None:
        _, band_rows = check_parity_bands(report)
    status_by_key = {key: in_band for key, *_r, in_band in band_rows}
    lines = [
        "| Metric | This build | Reference | Source (file:line) | Status |",
        "|---|---|---|---|---|",
    ]
    for key, label, ref_sets, source in PARITY_TABLE_ROWS:
        vals = report.get(key)
        ours = _fmt_folds(vals) if vals else "(not measured)"
        ref = ("; ".join(_fmt_folds(rs) for rs in ref_sets)
               if ref_sets else "save floor < 8.2, no published folds")
        if not vals:
            status = "—"
        elif key in status_by_key:
            status = "PASS" if status_by_key[key] else "FLAG"
        else:
            status = "info"
        lines.append(f"| {label} | {ours} | {ref} | {source} | {status} |")
    return "\n".join(lines)


#: reference Model/-tree filename grammar: clf names end in
#: ``_{metric:.2f}_{fold}`` (``audio_gru_whole.py:239``,
#: ``text_bilstm_whole.py:230``, ``fuse_net_whole.py:516``); reg names end
#: in ``_{metric:.2f}`` with the fold in the parent dir
#: (``Regression/{Audio,Text,Fuse}{fold}/``, ``audio_bilstm_perm.py:208``,
#: ``text_bilstm_perm.py:205``, ``fuse_net.py:451``).
_CLF_CKPT_RE = re.compile(r"^(?P<base>.+?)_(?P<metric>\d+(?:\.\d+)?)"
                          r"_(?P<fold>[123])$")
_REG_CKPT_RE = re.compile(r"^(?P<base>.+?)_(?P<metric>\d+(?:\.\d+)?)$")
_REG_DIR_RE = re.compile(r"^(?P<kind>Audio|Text|Fuse)(?P<fold>[123])$")


def _ckpt_modality(base: str) -> str:
    b = base.lower()
    if b.startswith("fuse"):
        return "fuse"
    # audio names carry the embedder tag: BiLSTM_gru_vlad256_256 /
    # gru_vlad256_256; plain BiLSTM_{hidden} is the text branch
    return "audio" if ("vlad" in b or "gru" in b) else "text"


def _discover_reference_ckpts(ckpt_dir: Path) -> dict:
    """Walk a reference ``Model/`` tree -> ``{task: [fold1..fold3 paths]}``.

    Accepts the tree root, ``Model/`` itself, or a flat directory of
    clf-named files; both the reference's ``.pt`` pickles and our ``.npz``
    checkpoints qualify.  Multiple gated saves per fold resolve to the
    best metric (max F1 for clf, min MAE for reg — the file the
    reference's checking scripts would hardcode).  Only tasks with all
    three folds present are returned; partial sets warn."""
    best: dict = {}   # (task, fold) -> (metric, path)

    def _offer(task, fold, metric, path):
        key = (task, fold)
        if key in best:
            old = best[key][0]
            if (metric <= old) if task.endswith("clf") else (metric >= old):
                return
        best[key] = (metric, path)

    for p in sorted(Path(ckpt_dir).rglob("*")):
        if p.suffix not in (".pt", ".npz") or not p.is_file():
            continue
        stem = p.stem
        mc = _CLF_CKPT_RE.match(stem)
        if mc:   # fold encoded in the filename -> classification track
            task = f"{_ckpt_modality(mc.group('base'))}_clf"
            _offer(task, int(mc.group("fold")), float(mc.group("metric")), p)
            continue
        regdir = _REG_DIR_RE.match(p.parent.name)
        mr = _REG_CKPT_RE.match(stem)
        if regdir and mr:   # fold encoded in the parent dir -> regression
            task = f"{regdir.group('kind').lower()}_reg"
            _offer(task, int(regdir.group("fold")),
                   float(mr.group("metric")), p)
    found: dict = {}
    for task in ("audio_clf", "text_clf", "fuse_clf",
                 "audio_reg", "text_reg", "fuse_reg"):
        paths = [best.get((task, f)) for f in (1, 2, 3)]
        if all(p is not None for p in paths):
            found[task] = [p[1] for p in paths]
        elif any(p is not None for p in paths):
            have = [f for f in (1, 2, 3) if best.get((task, f))]
            print(f"parity: {task} has checkpoints only for folds {have} "
                  "— need all 3, skipping", file=sys.stderr)
    return found


def _report_from_ckpts(args) -> dict:
    """Checkpoint-driven parity: discover a reference ``Model/`` tree and
    recompute every discovered task's fold metrics via the L5 checking
    harness (no training).  This is the acceptance path for the
    reference's RELEASED whole-module ``.pt`` checkpoints
    (``FuseModelChecking.py:10-12`` hardcodes exactly these files)."""
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.eval import checking
    from icassp2022_depression_tpu.frontend import audio as afe
    from icassp2022_depression_tpu.frontend import text as tfe

    found = _discover_reference_ckpts(Path(args.ckpt_dir))
    if not found:
        raise SystemExit(f"parity: no reference-layout checkpoints under "
                         f"{args.ckpt_dir} (expected "
                         "ClassificationWhole/{Audio,Text,Fuse}/"
                         "<name>_<metric>_<fold>.pt and/or "
                         "Regression/{Audio,Text,Fuse}<fold>/"
                         "<name>_<metric>.pt)")
    print("parity: checking " + ", ".join(
        f"{t} ({', '.join(p.name for p in ps)})"
        for t, ps in sorted(found.items())), file=sys.stderr)
    corpus = getattr(args, "corpus", None) or None
    root = Path(args.root or corpus)
    audio_dir, text_dir = _features_dirs(root)
    cache: dict = {}

    def _audio(track):
        key = ("a", track)
        if key not in cache:
            if corpus:
                feat, sds, clf, _ = afe.extract_eatd(Path(corpus))
                _require_speakers(sds, corpus)
                feat = np.squeeze(feat, axis=2)
                cache[("a", "clf")] = (feat, clf)
                cache[("a", "reg")] = (feat, sds)
            else:
                cache[key] = afe.load_features(audio_dir, track)
        return cache[key]

    def _text(track):
        key = ("t", track)
        if key not in cache:
            if corpus:
                feat, sds, clf = tfe.extract_eatd(
                    Path(corpus), seed=args.seed,
                    elmo_weights=args.elmo_weights,
                    segmenter=args.segmenter)
                cache[("t", "clf")] = (feat, clf)
                cache[("t", "reg")] = (feat, sds)
            else:
                cache[key] = tfe.load_features(text_dir, track)
        return cache[key]

    report: dict = {}
    clf_tasks = [t for t in found if t.endswith("clf")]
    if clf_tasks:
        y = (_audio if any(t.startswith(("audio", "fuse"))
                           for t in clf_tasks) else _text)("clf")[1]
        tf_idx = _train_folds(root, y, args.seed, args.idx_files)
        if "audio_clf" in found:
            x, ya = _audio("clf")
            res, _ = checking.check_audio_clf(x, ya, tf_idx,
                                              found["audio_clf"])
            report["audio_f1"] = [r["f1"] for r in res]
        if "text_clf" in found:
            x, yt = _text("clf")
            res, _ = checking.check_text_clf(x, yt, tf_idx,
                                             found["text_clf"])
            report["text_f1"] = [r["f1"] for r in res]
        if "fuse_clf" in found:
            xa, ya = _audio("clf")
            xt, _yt = _text("clf")
            res, _ = checking.check_fuse_clf(xa, xt, ya, tf_idx,
                                             found["fuse_clf"])
            report["fuse_f1"] = [r["f1"] for r in res]
    reg_tasks = [t for t in found if t.endswith("reg")]
    if reg_tasks:
        xa, ya = _audio("reg")
        dep, non = folds.generate_reg_shuffles(ya, seed=args.seed)
        if "audio_reg" in found:
            res, _ = checking.check_audio_reg(xa, ya, dep, non,
                                              found["audio_reg"])
            report["audio_mae"] = [r["mae"] for r in res]
        if "text_reg" in found:
            xt, yt = _text("reg")
            res, _ = checking.check_text_reg(xt, yt, dep, non,
                                             found["text_reg"])
            report["text_mae"] = [r["mae"] for r in res]
        if "fuse_reg" in found:
            xt, _yt = _text("reg")
            res, _ = checking.check_fuse_reg(xa, xt, ya, dep, non,
                                             found["fuse_reg"])
            report["fuse_mae"] = [r["mae"] for r in res]
    return report


def cmd_parity(args):
    """Real-corpus parity report: run both tracks with the reference
    configurations unchanged and print per-fold + mean metrics against
    BASELINE.md's bands, as the BASELINE.md-format markdown acceptance
    table.  Everything else (idx files, pretrained ELMo
    bundle) is picked up automatically when present.  ``--from-report``
    skips training and re-checks the bands on a saved report JSON (the
    first line this command prints).  ``--ckpt-dir`` skips training too:
    it discovers a reference ``Model/`` tree of released ``.pt`` (or our
    ``.npz``) checkpoints and scores THOSE — the acceptance path for the
    reference's published weights."""
    # a raw-corpus acceptance run needs no separate artifact root: Model/
    # and idx files default to living under the corpus dir itself
    root = args.root or getattr(args, "corpus", None)
    if args.from_report:
        report = json.loads(Path(args.from_report).read_text())
    elif getattr(args, "ckpt_dir", None):
        if not root:
            raise SystemExit("parity --ckpt-dir: also pass --root (with "
                             "Features/ npz) and/or --corpus (re-extract) "
                             "so the checking harness has features")
        report = _report_from_ckpts(args)
    elif not root:
        raise SystemExit("parity: --root and/or --corpus (train + check) "
                         "or --from-report (re-check a saved report) is "
                         "required")
    else:
        report = {}
        for track in ("clf", "reg"):
            ns = argparse.Namespace(track=track, root=root,
                                    model_dir=args.model_dir,
                                    idx_files=args.idx_files, seed=args.seed,
                                    lr=None, vmap_folds=args.vmap_folds,
                                    fold_parallel=False, data_parallel=1,
                                    corpus=getattr(args, "corpus", None),
                                    segmenter=getattr(args, "segmenter",
                                                      "auto"),
                                    elmo_weights=getattr(
                                        args, "elmo_weights", "auto"))
            report.update(_pipeline_summary(ns))
    if not any(report.get(k) for k in PARITY_BANDS):
        # a band check that never looked at a metric must not print PASS
        raise SystemExit("parity: the report contains none of the band "
                         "metrics (" + ", ".join(PARITY_BANDS) + ") — "
                         "nothing to check")
    print(json.dumps(report))
    rc, rows = check_parity_bands(report)
    print(parity_report_markdown(report, rows))
    print("PARITY: " + ("PASS" if rc == 0 else "FAIL"))
    return rc


def cmd_warmup(args):
    """Pre-compile the standard shape set into the persistent XLA
    compilation cache, so the first REAL corpus run does not pay the
    remote-service compiles (~100 s cold for the ELMo chunk-shape set
    alone — docs/PERFORMANCE.md).  ``serve --warmup`` covers serving;
    this covers extraction + training:

    * audio length buckets (one jitted program per pow2-padded utterance
      length — ``frontend/audio.py::_bucket_pipeline_flat``),
    * ELMo embedding chunk shapes at the corpus geometry (row bucket =
      ceil(3·n_speakers/8)·8, token axis in multiples of 16),
    * the whole-fold training programs of both tracks (epoch counts are
      preset-static, so the compiled programs depend only on the corpus
      geometry — warmed by running the fused pipeline on a synthetic
      corpus of ``--n-data/--n-validation`` speakers, default 83+79 =
      the real EATD split).

    Length-bucket coverage is duration-dependent: buckets outside
    [--min-seconds, --max-seconds] still compile on first contact.  The
    flat PCM stream's length is additionally corpus-SIZE dependent
    (quantized to 1/8-pow2 steps — ``shapes.next_quantized``), so a
    corpus whose total duration differs from the warmed synthetic one
    may pay one more bucket-pipeline compile on first contact; the
    persistent cache keeps it a one-time cost per corpus geometry."""
    import tempfile
    import time

    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import audio as afe
    from icassp2022_depression_tpu.frontend import text as tfe

    report = {}
    t_all = time.time()
    rng = np.random.default_rng(0)
    if not args.skip_buckets:
        t0 = time.time()
        sr = 16000
        secs, s = [], max(args.min_seconds, 0.25)
        while s <= args.max_seconds:
            secs.append(s)
            s *= 2
        wavs = [np.round(rng.standard_normal(int(sr * sec)) * 2000)
                .astype(np.int16) for sec in secs]
        afe.extract_batch(wavs, [sr] * len(wavs))
        report["audio_buckets"] = {"buckets": len(secs),
                                   "seconds": round(time.time() - t0, 2)}
        print(json.dumps({"warmup": "audio_buckets",
                          **report["audio_buckets"]}), flush=True)
    if not args.skip_text:
        t0 = time.time()
        embed, _dim, embedder_id = tfe.make_embedder(
            seed=args.seed, elmo_weights=args.elmo_weights, with_id=True)
        n_sent = 3 * (args.n_data + args.n_validation)
        toks, t = [], 16
        while t <= max(16, args.max_tokens):
            toks.append(t)
            t *= 2
        for max_t in toks:
            # one sentence pins the chunk's padded token axis at max_t;
            # the rest take the typical short lengths
            sentences = [["词"] * int(rng.integers(2, 9))
                         for _ in range(n_sent - 1)]
            sentences.append(["词"] * max_t)
            embed(sentences)
        report["text_chunks"] = {"sentences": n_sent,
                                 "token_buckets": toks,
                                 "embedder": embedder_id,
                                 "seconds": round(time.time() - t0, 2)}
        print(json.dumps({"warmup": "text_chunks",
                          **report["text_chunks"]}), flush=True)
    if not args.skip_train:
        t0 = time.time()
        with tempfile.TemporaryDirectory() as td:
            root = Path(td) / "corpus"
            eatd.make_synthetic_corpus(
                root, n_data=args.n_data, n_validation=args.n_validation,
                seconds=(args.min_seconds, args.max_seconds), seed=0)
            for track in args.tracks:
                ns = argparse.Namespace(
                    track=track, root=str(root),
                    model_dir=str(Path(td) / "model"), idx_files=None,
                    seed=args.seed, lr=None, vmap_folds=args.vmap_folds,
                    fold_parallel=False, data_parallel=1,
                    corpus=str(root), segmenter=args.segmenter,
                    elmo_weights=args.elmo_weights)
                _pipeline_summary(ns)
        report["train_programs"] = {
            "tracks": list(args.tracks),
            "speakers": args.n_data + args.n_validation,
            "seconds": round(time.time() - t0, 2)}
        print(json.dumps({"warmup": "train_programs",
                          **report["train_programs"]}), flush=True)
    print(json.dumps({"warmup": "done",
                      "total_s": round(time.time() - t_all, 2)}))
    return 0


def cmd_serve(args):
    """Run the stdlib HTTP serving front around one checkpoint."""
    from icassp2022_depression_tpu import serve

    kw = _embedder_kw(args)   # rejects --audio-embedder vggish off-audio
    if args.task.startswith("daic"):
        predictor = serve.DaicPredictor.from_checkpoint(
            args.ckpt, args.task, **_daic_embedder_kw(args))
        if predictor.multimodal:
            print("serve: multimodal DAIC model — requests must carry "
                  "per-response 'texts' aligned with responses_b64",
                  file=sys.stderr)
        if args.warmup:
            print("note: --warmup is a no-op for DAIC serving (shapes "
                  "depend on per-session response counts)",
                  file=sys.stderr)
    else:
        predictor = serve.Predictor.from_checkpoint(args.ckpt, args.task,
                                                    **kw)
        if args.warmup:
            predictor.warmup()
    serve.serve_http(predictor, args.host, args.port,
                     batch_window_ms=args.batch_window_ms,
                     max_batch=args.max_batch, max_queue=args.max_queue,
                     auth_token=args.auth_token,
                     tls_cert=args.tls_cert, tls_key=args.tls_key)
    return 0


def _embedder_kw(args) -> dict:
    """serve/predict: map the audio-embedder flags onto Predictor kwargs
    (vggish needs the matching 128-d input layer on audio tasks)."""
    kw = {}
    if getattr(args, "audio_embedder", "netvlad") == "vggish":
        if not args.task.startswith("audio"):
            raise SystemExit(
                "--audio-embedder vggish is supported for audio_* tasks "
                "only (fusion/DAIC checkpoints train on wav2vlad "
                "features; serve those with the default embedder)")
        from icassp2022_depression_tpu import config as C
        from icassp2022_depression_tpu.models import vggish

        kw["audio_embedder"] = "vggish"
        base = (C.AUDIO_CLF if args.task.endswith("clf")
                else C.AUDIO_REG).model
        kw["model_cfg"] = C.replace(base, embedding_size=128)
        # same embedder weights/postprocessor flags as extract-audio, so
        # a checkpoint trained on --vggish-ckpt/--pca-params features is
        # served on identically-computed ones
        if getattr(args, "vggish_ckpt", None):
            kw["vggish_params"] = vggish.from_tf_checkpoint(
                args.vggish_ckpt)
        if getattr(args, "pca_params", None):
            kw["vggish_postprocessor"] = vggish.load_pca_params(
                args.pca_params)
    # explicit segmenter/seed overrides (default: from_checkpoint adopts
    # the values recorded in the checkpoint's sidecar)
    if getattr(args, "segmenter", None):
        kw["segmenter"] = args.segmenter
    if getattr(args, "embed_seed", None) is not None:
        kw["seed"] = args.embed_seed
    return kw


def _daic_embedder_kw(args) -> dict:
    """serve/predict-daic: map the multimodal text-embedder flags onto
    DaicPredictor kwargs.  'auto'/None values are OMITTED so
    ``from_checkpoint``'s sidecar adoption (segmenter, seed, embedder
    mismatch check) stays in charge; ONE definition shared by both
    commands."""
    kw = {}
    if getattr(args, "multimodal", False):
        kw["multimodal"] = True
    if getattr(args, "elmo_weights", "auto") != "auto":
        kw["elmo_weights"] = args.elmo_weights or None
    if getattr(args, "segmenter", None):
        kw["segmenter"] = args.segmenter
    if getattr(args, "embed_seed", None) is not None:
        kw["seed"] = args.embed_seed
    return kw


def cmd_predict(args):
    """Serve a prediction for one corpus speaker from a checkpoint."""
    from icassp2022_depression_tpu import serve
    from icassp2022_depression_tpu.data import eatd

    split, number = args.speaker.split("/")
    sp = eatd.load_speaker(Path(args.root), split, int(number))
    if sp is None:
        raise SystemExit(f"speaker {args.speaker} not found under {args.root}")
    p = serve.Predictor.from_checkpoint(args.ckpt, args.task,
                                        **_embedder_kw(args))
    kw = {}
    if not args.task.startswith("text"):
        # corpus-position ordinal base -> NetVLAD features identical to
        # the training-time extraction of this speaker.  Same iteration
        # order as eatd.iter_speakers (Data then ValidationData, ids
        # ascending, existing dirs only) but WITHOUT decoding ~3 wavs
        # per preceding speaker just to count them.
        idx = 0
        root = Path(args.root)
        for sp_split in ("Data", "ValidationData"):
            for n_ in range(1, eatd.MAX_SPEAKER_ID + 1):
                if sp_split == split and n_ == int(number):
                    kw["ordinal_base"] = 3 * idx
                    break
                if (root / sp_split / str(n_)).is_dir():
                    idx += 1
            else:
                continue
            break
        kw.update(waveforms=sp.waveforms, sample_rates=sp.sample_rates)
    if not args.task.startswith("audio"):
        kw.update(texts=sp.texts)
    result = p.predict_speaker(**kw)
    result["speaker"] = args.speaker
    result["true_sds"] = sp.sds
    print(json.dumps(result))
    return 0


def cmd_predict_daic(args):
    """Serve a PHQ8 prediction for one raw DAIC session from a
    DAIC-trained checkpoint (completes serving coverage for the DAIC
    model family)."""
    from icassp2022_depression_tpu import serve

    p = serve.DaicPredictor.from_checkpoint(args.ckpt, args.task,
                                            **_daic_embedder_kw(args))
    result = p.predict_participant(Path(args.daic_dir), args.participant,
                                   queries_path=(Path(args.queries)
                                                 if args.queries else None),
                                   start_ordinal=args.start_ordinal)
    result["participant"] = args.participant
    print(json.dumps(result))
    return 0


def cmd_baselines(args):
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.eval import traditional
    from icassp2022_depression_tpu.frontend import audio as afe
    from icassp2022_depression_tpu.frontend import text as tfe

    root = Path(args.root)
    audio_dir, text_dir = _features_dirs(root)
    if args.task.endswith("_clf"):
        x, y = (afe.load_features(audio_dir, "clf")
                if args.task.startswith("audio")
                else tfe.load_features(text_dir, "clf"))
        tf_idx = _train_folds(root, y, args.seed, args.idx_files)
        _, summary = traditional.classify(x, y, tf_idx, model=args.model,
                                          seed=args.seed)
    else:
        x, y = (afe.load_features(audio_dir, "reg")
                if args.task.startswith("audio")
                else tfe.load_features(text_dir, "reg"))
        dep, non = folds.generate_reg_shuffles(y, seed=args.seed)
        _, summary = traditional.regress(x, y, dep, non, model=args.model,
                                         seed=args.seed)
    print(json.dumps({k: round(v, 4) for k, v in summary.items()}))
    return 0


def cmd_doctor(args):
    """Environment + relay-weather diagnostic.

    The deployment's host<->device relay has volatile bandwidth and a
    stiff per-round-trip latency (docs/PERFORMANCE.md), and cold
    compiles go through a remote service — so "is my run slow or is the
    weather bad?" is a real operational question.  This prints a
    human-readable report on stderr and ONE JSON line on stdout (the
    repo-wide machine-readable convention).  No reference equivalent
    (single process, CPU)."""
    import os
    import platform

    import jax

    report = {
        "python": platform.python_version(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "host_cores": os.cpu_count(),
    }
    try:
        import torch
        report["torch"] = torch.__version__
    except Exception:
        report["torch"] = None

    cache_dir = jax.config.jax_compilation_cache_dir
    cache = {"dir": cache_dir, "entries": 0, "mb": 0.0}
    if cache_dir and Path(cache_dir).is_dir():
        files = [f for f in Path(cache_dir).rglob("*") if f.is_file()]
        cache["entries"] = len(files)
        cache["mb"] = round(sum(f.stat().st_size for f in files) / 1e6, 1)
    report["compile_cache"] = cache

    if not args.no_probe:
        from icassp2022_depression_tpu.utils.relay import probe_weather
        report["relay"] = wx = probe_weather(size_mb=args.probe_mb,
                                             reps=args.reps)
        print(f"relay weather: roundtrip {wx['roundtrip_s'] * 1e3:.0f} ms "
              f"(typical ~450 ms), up {wx['up_mb_s']:.0f} MB/s, "
              f"down {wx['down_mb_s']:.0f} MB/s (observed envelope "
              "~16-900 MB/s)", file=sys.stderr)
    print(f"backend {report['backend']} ({len(report['devices'])} device(s)),"
          f" jax {report['jax']}, torch {report['torch']}, "
          f"{report['host_cores']} host core(s); compile cache: "
          f"{cache['entries']} entries, {cache['mb']} MB at {cache['dir']}",
          file=sys.stderr)
    print(json.dumps(report))
    return 0


def build_parser():
    p = argparse.ArgumentParser(prog="icassp2022_depression_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth-corpus", help="write a synthetic EATD corpus")
    sp.add_argument("--root", required=True)
    sp.add_argument("--n-data", type=int, default=20)
    sp.add_argument("--n-validation", type=int, default=8)
    sp.add_argument("--seconds", type=float, default=2.0)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_synth_corpus)

    sp = sub.add_parser("extract-audio",
                        help="EATD audio features (wav2vlad or VGGish)")
    sp.add_argument("--root", required=True)
    sp.add_argument("--out")
    sp.add_argument("--embedder", choices=["netvlad", "vggish"],
                    default="netvlad",
                    help="netvlad = the reference's committed wav2vlad "
                         "path (256-d); vggish = its declared alternative "
                         "to_vggish_embedds (128-d, _128 npz suffix)")
    sp.add_argument("--vggish-ckpt",
                    help="released vggish_model.ckpt to convert+use "
                         "(default: deterministic PRNG init)")
    sp.add_argument("--pca-params",
                    help="released vggish_pca_params.npz postprocessor")
    sp.set_defaults(fn=cmd_extract_audio)

    sp = sub.add_parser("extract-text", help="EATD text features")
    sp.add_argument("--root", required=True)
    sp.add_argument("--out")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--elmo-weights", default="auto",
                    help="converted ELMoForManyLangs bundle "
                    "(scripts/convert_elmo_zhs.py); 'auto' checks "
                    "ICASSP_ELMO_WEIGHTS and the cache, '' disables")
    sp.add_argument("--elmo-stateful", action="store_true",
                    help="emulate upstream ElmobiLm's cross-batch "
                    "statefulness (one sents2elmo call per speaker, biLM "
                    "state carried across calls) instead of the default "
                    "deterministic zero-state mode; slower — one device "
                    "round-trip per speaker")
    sp.add_argument("--elmo-tp", type=int, default=0,
                    help="run the LSTMP biLM tensor-parallel over the "
                    "first N devices (model-axis mesh, "
                    "parallel/elmo_tp.py); results match serial up to "
                    "collective reduction order. 0/1 = serial")
    sp.add_argument("--segmenter", default="auto",
                    help="Chinese word segmenter: auto (jieba when "
                    "importable, else the CJK fallback), jieba, fallback, "
                    "pkuseg, thulac, hanlp (the reference's commented "
                    "alternatives, text_features_whole.py:30-32; they "
                    "require their packages), or any name added via "
                    "frontend.text.register_segmenter")
    sp.set_defaults(fn=cmd_extract_text)

    sp = sub.add_parser("extract-daic", help="DAIC-WOZ features")
    sp.add_argument("--daic-dir", required=True)
    sp.add_argument("--split-csv", required=True)
    sp.add_argument("--queries", default=None,
                    help="question-bank file (default: the bundled DAIC "
                         "table, data/daic_queries.txt)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--split-name", default="train")
    sp.add_argument("--multimodal", action="store_true",
                    help="also extract the per-response text modality "
                         "(the reference drops it)")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--elmo-weights", default="auto")
    sp.add_argument("--segmenter", default="auto",
                    help="text-modality segmenter (--multimodal only; "
                         "see extract-text --segmenter)")
    sp.add_argument("--elmo-tp", type=int, default=0,
                    help="tensor-parallel biLM for the text modality "
                         "(--multimodal only; see extract-text --elmo-tp)")
    sp.set_defaults(fn=cmd_extract_daic)

    sp = sub.add_parser("train-daic", help="DAIC-WOZ downstream training")
    sp.add_argument("--track", required=True, choices=["clf", "reg"])
    sp.add_argument("--daic-dir",
                    help="FUSED extract->train from a raw DAIC directory: "
                         "one device-resident extraction pass per split "
                         "(requires --train-csv/--eval-csv; audio-only; "
                         "no features npz written)")
    sp.add_argument("--train-csv",
                    help="AVEC2017 train split CSV (with --daic-dir)")
    sp.add_argument("--eval-csv",
                    help="AVEC2017 dev/test split CSV (with --daic-dir)")
    sp.add_argument("--queries", default=None,
                    help="question-bank file (with --daic-dir; default: "
                         "the bundled table)")
    sp.add_argument("--features", required=False,
                    help="directory written by extract-daic")
    sp.add_argument("--eval-split", default="test",
                    help="split name used for gating/eval (e.g. dev/test)")
    sp.add_argument("--model-dir")
    sp.add_argument("--multimodal", action="store_true")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_train_daic)

    sp = sub.add_parser("check-daic",
                        help="recompute DAIC eval-split metrics from a "
                             "train-daic checkpoint")
    sp.add_argument("--track", required=True, choices=["clf", "reg"])
    sp.add_argument("--features", required=False)
    sp.add_argument("--daic-dir",
                    help="re-extract the eval split from this raw DAIC "
                         "dir (with --eval-csv; closes the no-npz loop "
                         "for train-daic --daic-dir checkpoints)")
    sp.add_argument("--eval-csv",
                    help="AVEC2017 split CSV (with --daic-dir)")
    sp.add_argument("--queries", default=None,
                    help="question-bank file (with --daic-dir; default: "
                         "the bundled table)")
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--eval-split", default=None,
                    help="persisted npz split name (with --features; "
                         "default 'test')")
    sp.add_argument("--multimodal", action="store_true")
    sp.set_defaults(fn=cmd_check_daic)

    sp = sub.add_parser("train", help="train one branch task")
    sp.add_argument("--task", required=True,
                    choices=["audio_clf", "text_clf", "audio_reg", "text_reg"])
    sp.add_argument("--root", required=True)
    sp.add_argument("--model-dir")
    sp.add_argument("--idx-files", nargs="*")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--verbose", action="store_true")
    sp.add_argument("--audio-dim", type=int, default=256,
                    help="audio feature width to load/train on (128 for "
                         "extract-audio --embedder vggish features)")
    sp.add_argument("--resume-dir", help="chunked execution + resume bundle dir")
    sp.add_argument("--chunk-epochs", type=int, default=25)
    sp.add_argument("--vmap-folds", action="store_true",
                    help="run all folds as ONE vmapped compiled program")
    sp.add_argument("--fold-parallel", action="store_true",
                    help="shard the vmapped fold axis over one device per "
                         "fold (implies --vmap-folds; 3 folds ~ 1 fold "
                         "wall-clock on a multi-chip mesh)")
    sp.add_argument("--data-parallel", type=int, default=1,
                    help="with --fold-parallel: devices per fold for "
                         "in-fold batch parallelism (2D fold x data mesh)")
    sp.add_argument("--corpus",
                    help="FUSED extract->train: extract features from "
                         "this EATD corpus dir (wav2vlad for audio tasks, "
                         "the resolved ELMo embedder for text tasks) and "
                         "train on them DEVICE-RESIDENT — no features "
                         "npz, no host readback between extraction and "
                         "training")
    sp.add_argument("--segmenter", default="auto",
                    help="with --corpus on text tasks: the segmenter for "
                         "the on-the-fly extraction (see extract-text "
                         "--segmenter)")
    sp.add_argument("--elmo-weights", default="auto",
                    help="with --corpus on text tasks: converted ELMo "
                         "bundle path / 'auto' (see extract-text "
                         "--elmo-weights)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("pipeline", help="full track incl. fusion")
    sp.add_argument("--track", required=True, choices=["clf", "reg"])
    sp.add_argument("--root", required=True)
    sp.add_argument("--model-dir")
    sp.add_argument("--idx-files", nargs="*")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--lr", type=float, default=None,
                    help="override every trainer's learning rate (demo aid; "
                         "default keeps the reference values)")
    sp.add_argument("--vmap-folds", action="store_true",
                    help="vectorise folds for the branch trainers (and reg "
                         "fusion; clf fusion is inherently sequential: "
                         "fold k+1 continues fold k's fc_final + Adam "
                         "state, fuse_net_whole.py:413-416)")
    sp.add_argument("--corpus",
                    help="FULLY FUSED track: extract BOTH modalities from "
                         "this EATD corpus dir DEVICE-RESIDENT (wav2vlad "
                         "audio + the resolved ELMo embedder) and run the "
                         "whole pipeline with zero persisted feature "
                         "artifacts")
    sp.add_argument("--segmenter", default="auto",
                    help="with --corpus: segmenter for the on-the-fly "
                         "text extraction (see extract-text --segmenter)")
    sp.add_argument("--elmo-weights", default="auto",
                    help="with --corpus: converted ELMo bundle path / "
                         "'auto' (see extract-text --elmo-weights)")
    sp.add_argument("--fold-parallel", action="store_true",
                    help="additionally shard the fold axis over one device "
                         "per fold (implies --vmap-folds)")
    sp.set_defaults(fn=cmd_pipeline)

    sp = sub.add_parser("check", help="recompute fold metrics from checkpoints")
    sp.add_argument("--task", required=True,
                    choices=["audio_clf", "text_clf", "fuse_clf",
                             "audio_reg", "text_reg", "fuse_reg"])
    sp.add_argument("--root", required=True)
    sp.add_argument("--ckpts", nargs="+", required=True,
                    help="one checkpoint per fold, in fold order")
    sp.add_argument("--idx-files", nargs="*")
    sp.add_argument("--corpus",
                    help="re-extract the needed feature sets from this "
                         "EATD corpus dir on the fly instead of reading "
                         "extract-audio/extract-text npz artifacts "
                         "(closes the no-npz loop for train/pipeline "
                         "--corpus checkpoints)")
    sp.add_argument("--segmenter", default="auto",
                    help="with --corpus on text/fusion tasks (see "
                         "extract-text --segmenter)")
    sp.add_argument("--elmo-weights", default="auto",
                    help="with --corpus on text/fusion tasks (see "
                         "extract-text --elmo-weights)")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_check)

    sp = sub.add_parser("export-pt",
                        help="export a checkpoint as a reference-layout "
                             "torch state-dict .pt (reverse migration)")
    sp.add_argument("--task", required=True,
                    choices=["audio_clf", "text_clf", "fuse_clf",
                             "audio_reg", "text_reg", "fuse_reg"])
    sp.add_argument("--ckpt", required=True,
                    help="our .npz checkpoint (or a .pt to re-emit as a "
                         "state-dict pickle)")
    sp.add_argument("--out", required=True, help="output .pt path")
    sp.set_defaults(fn=cmd_export_pt)

    sp = sub.add_parser("predict", help="serve one speaker from a checkpoint")
    sp.add_argument("--task", required=True, choices=list(
        ("audio_clf", "text_clf", "fuse_clf",
         "audio_reg", "text_reg", "fuse_reg")))
    sp.add_argument("--root", required=True)
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--speaker", required=True,
                    help="e.g. Data/5 or ValidationData/12")
    sp.add_argument("--audio-embedder", choices=["netvlad", "vggish"],
                    default="netvlad",
                    help="serve checkpoints trained on extract-audio "
                         "--embedder vggish features")
    sp.add_argument("--vggish-ckpt",
                    help="with --audio-embedder vggish: the SAME released "
                         "ckpt extraction used (default: bundle autoload "
                         "/ PRNG init)")
    sp.add_argument("--pca-params",
                    help="with --audio-embedder vggish: the SAME PCA "
                         "postprocessor extraction used")
    sp.add_argument("--segmenter", default=None,
                    help="override the text segmenter (default: adopt "
                         "the one recorded by the checkpoint's training "
                         "features)")
    sp.add_argument("--embed-seed", type=int, default=None,
                    help="PRNG stand-in text-embedder seed override "
                         "(default: adopt the checkpoint's recorded "
                         "extraction seed)")
    sp.set_defaults(fn=cmd_predict)

    sp = sub.add_parser("predict-daic",
                        help="serve one raw DAIC session from a "
                             "train-daic checkpoint")
    sp.add_argument("--task", required=True,
                    choices=["daic_clf", "daic_reg"])
    sp.add_argument("--daic-dir", required=True)
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--participant", type=int, required=True)
    sp.add_argument("--queries",
                    help="question bank (default: the bundled "
                         "data/daic_queries.txt)")
    sp.add_argument("--start-ordinal", type=int, default=0,
                    help="cumulative utterance ordinal of this "
                         "participant in its split (reproduces "
                         "training-time NetVLAD features)")
    sp.add_argument("--multimodal", action="store_true",
                    help="force multimodal serving (audio + per-response "
                         "text); checkpoints written by current trainers "
                         "are auto-detected from their recorded "
                         "embedding_size")
    sp.add_argument("--elmo-weights", default="auto",
                    help="multimodal text embedder bundle (as "
                         "extract-daic --elmo-weights; '' = PRNG "
                         "stand-in)")
    sp.add_argument("--segmenter", default=None,
                    help="multimodal text segmenter (as extract-daic "
                         "--segmenter)")
    sp.add_argument("--embed-seed", type=int, default=None,
                    help="PRNG stand-in text-embedder seed override "
                         "(default: adopt the checkpoint's recorded "
                         "extraction seed)")
    sp.set_defaults(fn=cmd_predict_daic)

    sp = sub.add_parser("parity", help="real-corpus parity report vs "
                        "BASELINE.md (runs both tracks)")
    sp.add_argument("--root")
    sp.add_argument("--model-dir")
    sp.add_argument("--idx-files", nargs="*",
                    help="the reference's persisted train_idxs_*.npy")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--vmap-folds", action="store_true")
    sp.add_argument("--corpus",
                    help="run the acceptance report FUSED straight from "
                         "this raw EATD corpus dir (both modalities "
                         "extracted on the fly, no Features/ npz needed)")
    sp.add_argument("--segmenter", default="auto")
    sp.add_argument("--elmo-weights", default="auto")
    sp.add_argument("--from-report",
                    help="re-check bands on a saved report JSON instead of "
                         "retraining")
    sp.add_argument("--ckpt-dir",
                    help="score a reference Model/ tree of released .pt "
                         "(or our .npz) checkpoints instead of training "
                         "(ClassificationWhole/{Audio,Text,Fuse}/ and "
                         "Regression/{Audio,Text,Fuse}<fold>/ layouts)")
    sp.set_defaults(fn=cmd_parity)

    sp = sub.add_parser("warmup",
                        help="pre-compile the standard extraction/training "
                             "shape set into the persistent compilation "
                             "cache (serve --warmup covers serving)")
    sp.add_argument("--n-data", type=int, default=83,
                    help="synthetic Data/ speakers (default = real EATD)")
    sp.add_argument("--n-validation", type=int, default=79,
                    help="synthetic ValidationData/ speakers")
    sp.add_argument("--tracks", nargs="*", default=["clf", "reg"],
                    choices=["clf", "reg"])
    sp.add_argument("--min-seconds", type=float, default=1.0,
                    help="shortest utterance-length bucket to warm")
    sp.add_argument("--max-seconds", type=float, default=16.0,
                    help="longest utterance-length bucket to warm")
    sp.add_argument("--max-tokens", type=int, default=32,
                    help="longest ELMo token-axis bucket to warm "
                         "(multiples of 16)")
    sp.add_argument("--elmo-weights", default="auto")
    sp.add_argument("--segmenter", default="auto")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--vmap-folds", action="store_true",
                    help="warm the fold-vmapped train programs instead of "
                         "the sequential ones")
    sp.add_argument("--skip-buckets", action="store_true")
    sp.add_argument("--skip-text", action="store_true")
    sp.add_argument("--skip-train", action="store_true")
    sp.set_defaults(fn=cmd_warmup)

    sp = sub.add_parser("serve", help="HTTP serving front (stdlib)")
    sp.add_argument("--task", required=True, choices=[
        "audio_clf", "text_clf", "fuse_clf",
        "audio_reg", "text_reg", "fuse_reg",
        "daic_clf", "daic_reg"])
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8000)
    sp.add_argument("--warmup", action="store_true",
                    help="pre-compile standard serving shapes at startup")
    sp.add_argument("--batch-window-ms", type=float, default=0.0,
                    help=">0: threaded server that micro-batches "
                         "concurrent requests into one device batch")
    sp.add_argument("--max-batch", type=int, default=32)
    sp.add_argument("--max-queue", type=int, default=128,
                    help="admission bound (pending speakers); overload "
                         "sheds with 503 + Retry-After instead of "
                         "queueing unboundedly")
    sp.add_argument("--auth-token", default=None,
                    help="require 'Authorization: Bearer <token>' on "
                         "prediction endpoints (healthz stays open)")
    sp.add_argument("--tls-cert", default=None,
                    help="PEM certificate chain: serve HTTPS")
    sp.add_argument("--tls-key", default=None,
                    help="PEM private key for --tls-cert")
    sp.add_argument("--audio-embedder", choices=["netvlad", "vggish"],
                    default="netvlad",
                    help="serve checkpoints trained on extract-audio "
                         "--embedder vggish features")
    sp.add_argument("--vggish-ckpt",
                    help="with --audio-embedder vggish: the SAME released "
                         "ckpt extraction used (default: bundle autoload "
                         "/ PRNG init)")
    sp.add_argument("--pca-params",
                    help="with --audio-embedder vggish: the SAME PCA "
                         "postprocessor extraction used")
    sp.add_argument("--segmenter", default=None,
                    help="override the text segmenter (default: adopt "
                         "the one recorded by the checkpoint's training "
                         "features)")
    sp.add_argument("--elmo-weights", default="auto",
                    help="text embedder bundle for multimodal DAIC "
                         "serving ('' = PRNG stand-in; EATD tasks "
                         "auto-load as always)")
    sp.add_argument("--embed-seed", type=int, default=None,
                    help="PRNG stand-in text-embedder seed override "
                         "(default: adopt the checkpoint's recorded "
                         "extraction seed)")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("baselines", help="sklearn baselines")
    sp.add_argument("--task", required=True,
                    choices=["audio_clf", "text_clf", "audio_reg", "text_reg"])
    sp.add_argument("--root", required=True)
    sp.add_argument("--model", default="rf")
    sp.add_argument("--idx-files", nargs="*")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_baselines)

    sp = sub.add_parser("doctor",
                        help="environment + relay-weather diagnostic")
    sp.add_argument("--probe-mb", type=float, default=8.0,
                    help="payload size for the bandwidth probe")
    sp.add_argument("--reps", type=int, default=3)
    sp.add_argument("--no-probe", action="store_true",
                    help="skip the device round-trip/bandwidth probe "
                         "(report static environment facts only)")
    sp.set_defaults(fn=cmd_doctor)

    # the TPU-bound, minutes-long subcommands run under the relay-wedge
    # stall watchdog by default when invoked as a process (see main());
    # the flags exist on exactly those subcommands
    from icassp2022_depression_tpu.utils import watchdog as _wd
    for name, wsp in sub.choices.items():
        if name in _wd.WATCHED_COMMANDS:
            g = wsp.add_argument_group(
                "watchdog", "relay-wedge recovery (utils/watchdog.py): "
                "the command runs in a supervised child; no output for "
                "the stall window -> kill + rerun in a fresh process "
                "(training continues from --resume-dir chunks)")
            g.add_argument("--no-watchdog", dest="watchdog",
                           action="store_false", default=True,
                           help="run in-process, no supervision")
            g.add_argument("--watchdog-stall-s", type=float, default=None,
                           help="no-output stall window in seconds "
                                "(default ICASSP_WATCHDOG_S or 900)")

    return p


def main(argv=None, *, watchdog_entry: bool = False):
    """``watchdog_entry`` is True only for the real process entry point
    (``python -m icassp2022_depression_tpu.cli``): watched subcommands
    then re-exec under the stall supervisor.  In-process callers (tests,
    notebooks) keep direct execution."""
    from icassp2022_depression_tpu.utils import watchdog as _wd

    if argv is None:
        argv = sys.argv[1:]
    args = build_parser().parse_args(argv)
    if (watchdog_entry and getattr(args, "watchdog", False)
            and not os.environ.get(_wd.CHILD_ENV)):
        return _wd.supervise(list(argv), stall_s=args.watchdog_stall_s)
    return args.fn(args) or 0


def script_main():
    """console_scripts entry point — same supervised semantics as
    ``python -m icassp2022_depression_tpu.cli``."""
    return main(watchdog_entry=True)


if __name__ == "__main__":
    sys.exit(main(watchdog_entry=True))

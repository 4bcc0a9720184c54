#!/usr/bin/env python
"""Convert a released ELMoForManyLangs model directory to the framework's
single-npz weight bundle.

The reference loads the zhs model through the upstream package
(``Classification/text_features_whole.py:16``); this converter needs only
torch, because the released directory is plain files:

    zhs.model/
      config.json                      (points at the architecture config)
      cnn_50_100_512_4096_sample.json  (architecture config)
      char.dic  word.dic               (tab-separated lexicons)
      token_embedder.pkl  encoder.pkl  (torch.save-d state dicts)

Usage:
    python scripts/convert_elmo_zhs.py /path/to/zhs.model \
        -o ~/.cache/icassp2022_tpu/elmo_zhs.npz

`extract-text` then auto-loads the bundle from ``ICASSP_ELMO_WEIGHTS`` or
``~/.cache/icassp2022_tpu/elmo_zhs.npz`` (pass ``--elmo-weights`` to point
elsewhere).  Validate a conversion with ``--check``: it embeds two fixture
sentences and prints their pooled-vector norms (compare against
``Embedder.sents2elmo`` means from the source environment).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from icassp2022_depression_tpu.models import elmo_pretrained  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model_dir", type=Path,
                    help="released ELMoForManyLangs model directory")
    ap.add_argument("-o", "--out", type=Path,
                    default=Path.home() / ".cache" / "icassp2022_tpu" /
                    "elmo_zhs.npz")
    ap.add_argument("--check", action="store_true",
                    help="embed two fixture sentences after converting")
    args = ap.parse_args(argv)

    pe = elmo_pretrained.convert_model_dir(args.model_dir)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    elmo_pretrained.save_npz(args.out, pe)
    n_params = sum(
        int(v.size) for v in
        __import__("jax").tree_util.tree_leaves(
            (pe.cc_params, pe.enc_params)))
    print(f"wrote {args.out} ({n_params:,} params, "
          f"chars={len(pe.char_lexicon)}, "
          f"words={len(pe.word_lexicon) if pe.word_lexicon else 0})")

    if args.check:
        roundtrip = elmo_pretrained.load_npz(args.out)
        sents = [["今天", "天气", "很", "好"], ["我", "有点", "累"]]
        emb = roundtrip.embed_sentences(sents)
        for s, e in zip(sents, emb):
            print("".join(s), "->", e.shape, "norm", float((e ** 2).sum()
                                                           ** 0.5))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""docs/MIGRATION.md drift guard.

The migration guide promises a command for every reference entry point;
these tests pin (a) that every `$CLI <subcommand> --flag ...` it shows
actually exists in the parser with those flags, and (b) that all 17
reference files (SURVEY.md §0) are mapped.  Doc-rot here would strand
exactly the users the guide exists for.
"""

import re
from pathlib import Path

from icassp2022_depression_tpu import cli

DOC = Path(__file__).resolve().parents[1] / "docs" / "MIGRATION.md"

#: the reference's complete file inventory (SURVEY.md §0: 17 files).
REFERENCE_FILES = [
    "Classification/audio_features_whole.py",
    "Classification/text_features_whole.py",
    "Classification/audio_gru_whole.py",
    "Classification/text_bilstm_whole.py",
    "Classification/fuse_net_whole.py",
    "Classification/AudioModelChecking.py",
    "Classification/TextModelChecking.py",
    "Classification/FuseModelChecking.py",
    "Classification/AudioTraditionalClassifiers.py",
    "Classification/TextTraditionalClassifiers.py",
    "Regression/audio_bilstm_perm.py",
    "Regression/text_bilstm_perm.py",
    "Regression/fuse_net.py",
    "Regression/AudioModelChecking.py",
    "DAICFeatureExtarction/feature_extraction.py",
    "DAICFeatureExtarction/queries.txt",
]


def _subparsers():
    parser = cli.build_parser()
    for action in parser._subparsers._group_actions:
        return action.choices
    raise AssertionError("no subparsers found")


def _cli_invocations():
    """Yield (subcommand, [flags]) for every `$CLI ...` backtick span."""
    text = DOC.read_text()
    for span in re.findall(r"`\$CLI ([^`]+)`", text):
        for part in span.split(","):
            part = part.strip()
            m = re.match(r"([a-z][a-z0-9-]*)", part)
            if not m:
                continue
            yield m.group(1), re.findall(r"(--[a-z][a-z0-9-]*)", part)


def test_every_cli_invocation_in_doc_exists():
    subs = _subparsers()
    invocations = list(_cli_invocations())
    assert invocations, "no $CLI invocations parsed from the doc"
    for name, flags in invocations:
        assert name in subs, f"MIGRATION.md names unknown subcommand {name}"
        known = set(subs[name]._option_string_actions)
        for flag in flags:
            assert flag in known, (
                f"MIGRATION.md shows `{name} {flag}` but the parser for "
                f"{name} does not accept it")


def test_doc_names_every_cli_subcommand():
    text = DOC.read_text()
    missing = [name for name in _subparsers() if name not in text]
    assert not missing, f"subcommands absent from MIGRATION.md: {missing}"


def test_doc_maps_all_reference_files():
    text = DOC.read_text()
    missing = [f for f in REFERENCE_FILES if Path(f).name not in text]
    assert not missing, f"reference files unmapped in MIGRATION.md: {missing}"


def test_parity_accepts_corpus_without_root(tmp_path, capsys, monkeypatch):
    """`parity --corpus <dir>` must not demand a separate --root (Model/
    and idx files default under the corpus dir, README's
    `--root ./corpus --corpus ./corpus` idiom collapsed)."""
    import pytest

    with pytest.raises(SystemExit) as e:
        cli.main(["parity"])
    assert "--corpus" in str(e.value)
    seen = []
    monkeypatch.setattr(cli, "_pipeline_summary",
                        lambda ns: (seen.append(ns), {})[1])
    # both tracks run with root defaulted to the corpus dir; the empty
    # stubbed report then trips the nothing-to-check guard (an empty
    # report must never print PASS)
    with pytest.raises(SystemExit) as e3:
        cli.main(["parity", "--corpus", str(tmp_path)])
    assert "none of the band metrics" in str(e3.value)
    assert [ns.track for ns in seen] == ["clf", "reg"]
    assert all(ns.root == str(tmp_path) and ns.corpus == str(tmp_path)
               for ns in seen)

"""fetch_vocab install flow (VERDICT r3 next-step #8): one explicit step
makes string prompts work on any machine."""

import json
import os
import subprocess
import sys

import pytest

from sfast_tpu.text.clip_tokenizer import CLIPTokenizer, _bytes_to_unicode
from sfast_tpu.text import fetch_vocab

from tests.text.test_clip_tokenizer import _train_bpe, PROMPTS


@pytest.fixture()
def ckpt_dir(tmp_path):
    d = tmp_path / "ckpt" / "tokenizer"
    d.mkdir(parents=True)
    merges = _train_bpe(PROMPTS + ["a photo of a cat"], 64)
    chars = list(_bytes_to_unicode().values())
    vocab_list = chars + [c + "</w>" for c in chars]
    vocab_list += ["".join(m) for m in merges]
    vocab_list += ["<|startoftext|>", "<|endoftext|>"]
    with open(d / "vocab.json", "w", encoding="utf-8") as f:
        json.dump({t: i for i, t in enumerate(vocab_list)}, f, ensure_ascii=False)
    with open(d / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(tmp_path / "ckpt")


def test_install_from_checkpoint_dir(ckpt_dir, tmp_path):
    out = str(tmp_path / "data")
    d = fetch_vocab.install(ckpt_dir, out)
    assert os.path.isfile(os.path.join(d, "vocab.json"))
    assert os.path.isfile(os.path.join(d, "merges.txt"))
    # installed data actually drives the tokenizer
    tok = CLIPTokenizer.from_files(
        os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")
    )
    assert tok("a photo of a cat", return_tensors="np").input_ids.shape == (1, 77)


def test_install_missing_source_raises(tmp_path, monkeypatch):
    monkeypatch.delenv("SFAST_TPU_CLIP_VOCAB", raising=False)
    # empty HF caches and no packaged data (unless the repo has one)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "nohf"))
    packaged = os.path.join(os.path.dirname(fetch_vocab.__file__), "data")
    if os.path.isfile(os.path.join(packaged, "vocab.json")):
        pytest.skip("packaged vocab present; discovery will succeed")
    with pytest.raises(FileNotFoundError):
        fetch_vocab.install(str(tmp_path / "does-not-exist-xyz"), str(tmp_path / "o"))


def test_cli_entry(ckpt_dir, tmp_path):
    out = str(tmp_path / "data2")
    r = subprocess.run(
        [
            sys.executable, "-m", "sfast_tpu.text.fetch_vocab",
            "--from", ckpt_dir, "--out", out,
        ],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
    )
    assert r.returncode == 0, r.stderr
    assert os.path.isfile(os.path.join(out, "vocab.json"))

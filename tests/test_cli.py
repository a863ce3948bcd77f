"""CLI tests (reference: bitnet-cli integration tests)."""

import json

import pytest

from bitnet_tpu.cli import main


class TestCLI:
    def test_inspect(self, mini_gguf_f32, capsys):
        rc = main(["inspect", "--model", mini_gguf_f32.path])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["architecture"] == "bitnet-25"
        assert out["n_tensors"] == 20

    def test_inspect_tensors(self, mini_gguf_f32, capsys):
        rc = main(["inspect", "--model", mini_gguf_f32.path, "--tensors"])
        out = json.loads(capsys.readouterr().out)
        assert len(out["tensors"]) == 20

    def test_tokenize(self, mini_gguf_f32, capsys):
        rc = main(["tokenize", "--model", mini_gguf_f32.path, "--prompt", "ab"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["count"] == len(out["ids"])

    def test_run_greedy(self, mini_gguf_f32, capsys):
        rc = main([
            "run", "--model", mini_gguf_f32.path, "--prompt", "hi",
            "--max-new-tokens", "3", "--greedy", "--no-stream",
            "--max-seq-len", "64", "--compute-dtype", "f32",
            "--prompt-template", "raw",
        ])
        assert rc == 0

    def test_run_with_receipt(self, mini_gguf_f32, tmp_path, capsys):
        rp = str(tmp_path / "receipt.json")
        rc = main([
            "run", "--model", mini_gguf_f32.path, "--prompt", "hi",
            "--max-new-tokens", "2", "--greedy", "--no-stream",
            "--max-seq-len", "64", "--compute-dtype", "f32",
            "--prompt-template", "raw", "--receipt", rp,
        ])
        assert rc == 0
        rec = json.load(open(rp))
        assert rec["schema_version"] == "1.0.0"
        assert rec["compute_path"] == "real"

    def test_score(self, mini_gguf_f32, capsys):
        rc = main([
            "score", "--model", mini_gguf_f32.path,
            "--prompt", "hello world this is a test",
            "--max-seq-len", "64", "--compute-dtype", "f32",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["perplexity"] > 0

    def test_benchmark(self, mini_gguf_f32, capsys):
        rc = main([
            "benchmark", "--model", mini_gguf_f32.path, "--prompt", "hi",
            "--max-new-tokens", "3", "--max-seq-len", "64",
            "--compute-dtype", "f32",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["decode_tok_s"] >= 0
        assert out["kernel_path"] == "xla"

    def test_compat_check(self, mini_gguf_f32, capsys):
        rc = main(["compat-check", "--model", mini_gguf_f32.path])
        assert rc == 0

    def test_list_templates(self, capsys):
        assert main(["list-templates"]) == 0
        assert "llama3-chat" in capsys.readouterr().out

    def test_list_architectures(self, capsys):
        assert main(["list-architectures"]) == 0

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

    def test_run_stop_sequence(self, mini_gguf_f32, capsys):
        """--stop truncates generation (reference main.rs --stop alias
        family); the stopped run must be a strict prefix of the base."""
        args = ["run", "--model", mini_gguf_f32.path, "--prompt", "hi",
                "--max-new-tokens", "8", "--greedy", "--no-stream",
                "--max-seq-len", "64", "--compute-dtype", "f32",
                "--prompt-template", "raw"]
        assert main(args) == 0
        base = capsys.readouterr().out.rstrip("\n")
        stop = base[:2]
        assert main(args + ["--stop", stop]) == 0
        stopped = capsys.readouterr().out.rstrip("\n")
        assert len(stopped) < len(base)
        assert base.startswith(stopped)

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


class TestChatAndConvert:
    def test_chat_repl_scripted(self, mini_gguf_f32, monkeypatch, capsys):
        """Drive the chat REPL through scripted stdin: help, a turn,
        clear, metrics, exit."""
        import io

        from bitnet_tpu.cli import main

        lines = iter(["/help", "hi", "/metrics", "/clear", "/exit"])
        monkeypatch.setattr("builtins.input", lambda *_: next(lines))
        rc = main(["chat", "-m", mini_gguf_f32.path,
                   "--max-new-tokens", "3", "--greedy",
                   "--max-seq-len", "128",
                   "--kv-cache-dtype", "f32", "--compute-dtype", "f32",
                   "--prompt-template", "raw"])
        assert rc == 0

    def test_convert_roundtrip(self, tmp_path, rng, capsys):
        """SafeTensors → GGUF → load (st2gguf parity)."""
        import numpy as np
        from safetensors.numpy import save_file

        import jax.numpy as jnp
        from bitnet_tpu.cli import main
        from bitnet_tpu.models import load_model

        H, F, V, NH, NKV, D = 64, 128, 64, 4, 2, 16
        t = {
            "model.embed_tokens.weight": rng.normal(
                size=(V, H)).astype(np.float32) * 0.05,
            "model.norm.weight": np.ones(H, np.float32),
        }
        for i in range(2):
            p = f"model.layers.{i}"
            t[f"{p}.input_layernorm.weight"] = np.ones(H, np.float32)
            t[f"{p}.post_attention_layernorm.weight"] = np.ones(
                H, np.float32)
            t[f"{p}.self_attn.q_proj.weight"] = rng.normal(
                size=(NH * D, H)).astype(np.float32) * 0.05
            t[f"{p}.self_attn.k_proj.weight"] = rng.normal(
                size=(NKV * D, H)).astype(np.float32) * 0.05
            t[f"{p}.self_attn.v_proj.weight"] = rng.normal(
                size=(NKV * D, H)).astype(np.float32) * 0.05
            t[f"{p}.self_attn.o_proj.weight"] = rng.normal(
                size=(H, NH * D)).astype(np.float32) * 0.05
            t[f"{p}.mlp.gate_proj.weight"] = rng.normal(
                size=(F, H)).astype(np.float32) * 0.05
            t[f"{p}.mlp.up_proj.weight"] = rng.normal(
                size=(F, H)).astype(np.float32) * 0.05
            t[f"{p}.mlp.down_proj.weight"] = rng.normal(
                size=(H, F)).astype(np.float32) * 0.05
        st = str(tmp_path / "model.safetensors")
        save_file(t, st)
        # HF checkpoints ship config.json alongside the shards
        import json as _json

        (tmp_path / "config.json").write_text(_json.dumps({
            "hidden_size": H, "intermediate_size": F,
            "num_hidden_layers": 2, "num_attention_heads": NH,
            "num_key_value_heads": NKV, "head_dim": D,
            "vocab_size": V, "rms_norm_eps": 1e-5,
            "rope_theta": 10000.0, "max_position_embeddings": 128,
        }))
        out = str(tmp_path / "model.gguf")
        rc = main(["convert", "--input", st, "--output", out, "--quant", "f32"])
        assert rc == 0
        cfg, params, _ = load_model(out, param_dtype=jnp.float32)
        assert cfg.hidden_size == H and cfg.num_layers == 2
        assert cfg.num_heads == NH and cfg.num_kv_heads == NKV
        assert cfg.head_dim == D


class TestConfigInfoBenchCompare:
    """config / info / bench-compare (reference Commands::Config / Info,
    xtask CompareMetrics / DetectBreaking)."""

    def test_config_roundtrip(self, tmp_path, monkeypatch, capsys):
        import json as _json

        cfg_file = tmp_path / "cfg.json"
        monkeypatch.setenv("BITNET_TPU_CONFIG", str(cfg_file))
        assert main(["config", "set", "model", "/x/y.gguf"]) == 0
        assert main(["config", "show"]) == 0
        out = capsys.readouterr().out
        assert "/x/y.gguf" in out
        assert main(["config", "path"]) == 0
        assert str(cfg_file) in capsys.readouterr().out
        # numbers stay numeric
        assert main(["config", "set", "max_seq_len", "4096"]) == 0
        assert _json.loads(cfg_file.read_text())["max_seq_len"] == 4096
        assert main(["config", "unset", "model"]) == 0
        assert "model" not in _json.loads(cfg_file.read_text())

    def test_model_falls_back_to_config(self, mini_gguf_f32, tmp_path,
                                        monkeypatch, capsys):
        cfg_file = tmp_path / "cfg.json"
        monkeypatch.setenv("BITNET_TPU_CONFIG", str(cfg_file))
        assert main(["config", "set", "model", mini_gguf_f32.path]) == 0
        capsys.readouterr()
        rc = main(["tokenize", "--prompt", "ab"])
        assert rc == 0
        assert '"ids"' in capsys.readouterr().out

    def test_model_missing_errors(self, tmp_path, monkeypatch, capsys):
        import pytest as _pytest

        monkeypatch.setenv("BITNET_TPU_CONFIG",
                           str(tmp_path / "none.json"))
        with _pytest.raises(SystemExit):
            main(["tokenize", "--prompt", "ab"])

    def test_info(self, capsys):
        import json as _json

        assert main(["info", "--device-timeout", "5"]) == 0
        info = _json.loads(capsys.readouterr().out)
        assert "jax" in info and "python" in info
        assert "device" in info

    def test_bench_compare(self, tmp_path, capsys):
        import json as _json

        a = tmp_path / "a.json"
        b = tmp_path / "b.json"
        a.write_text(_json.dumps({
            "metric": "decode", "value": 100.0, "unit": "tok/s",
            "decode_ms": 10.0}))
        b.write_text(_json.dumps({
            "metric": "decode", "value": 120.0, "unit": "tok/s",
            "decode_ms": 8.0}))
        assert main(["bench-compare", str(a), str(b)]) == 0
        out = capsys.readouterr().out
        assert "improved" in out
        # reversed: tok/s drop AND ms growth are both regressions
        assert main(["bench-compare", str(b), str(a)]) == 1
        out = capsys.readouterr().out
        assert "REGRESSION" in out

    def test_bench_compare_driver_artifact(self, tmp_path, capsys):
        import json as _json

        a = tmp_path / "r.json"
        a.write_text(_json.dumps({
            "n": 1, "rc": 0,
            "tail": 'noise\n{"metric": "d", "value": 50.0, '
                    '"unit": "tok/s"}\n'}))
        b = tmp_path / "raw.txt"
        b.write_text('# comment\n{"metric": "d", "value": 55.0, '
                     '"unit": "tok/s"}\n')
        assert main(["bench-compare", str(a), str(b), "--json"]) == 0
        rep = _json.loads(capsys.readouterr().out)
        assert rep["rows"][0]["change_pct"] == 10.0

"""Script/harness coverage — the reference tests its scripts too
(tests/test_client.py, test_sync_requirements.py; SURVEY.md §4 item 6).
Covers: load-generator math + end-to-end run against a stub server, corpus
builder artifacts, experiment aggregation, metrics scrape parsing, and
requirements sync."""

import csv
import importlib.util
import json
import os
import sys
import threading

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestProfilePipeline:
    def test_percentile_math(self):
        pp = load_script("profile_pipeline")
        vals = sorted([0.1, 0.2, 0.3, 0.4, 1.0])
        assert pp.percentile(vals, 50) == 0.3
        assert pp.percentile(vals, 99) == 1.0
        assert pp.percentile([], 95) == 0.0

    def test_make_query_randomize_busts_cache(self):
        pp = load_script("profile_pipeline")
        assert pp.make_query(3, False) == pp.make_query(3, False)
        assert pp.make_query(3, True) != pp.make_query(3, True)

    def test_main_against_stub_server(self, tmp_path, monkeypatch):
        """Full load-generator run against a local stub /query server:
        JSONL per request + summary.csv with p50/p95/req_per_min."""
        from http.server import BaseHTTPRequestHandler, HTTPServer

        class H(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                json.loads(self.rfile.read(n))
                body = json.dumps(
                    {"request_id": "x", "generated_response": "ok",
                     "sentiment": "neutral", "is_toxic": False}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        srv = HTTPServer(("127.0.0.1", 0), H)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            pp = load_script("profile_pipeline")
            out = str(tmp_path / "prof")
            monkeypatch.setattr(
                sys, "argv",
                ["profile_pipeline.py", "--url",
                 f"http://127.0.0.1:{srv.server_port}", "--requests", "12",
                 "--concurrency", "3", "--out-dir", out, "--run-id", "t1"],
            )
            pp.main()
            rows = [json.loads(l) for l in open(
                os.path.join(out, "requests_t1.jsonl"))]
            assert len(rows) == 12 and all(r["ok"] for r in rows)
            with open(os.path.join(out, "summary.csv")) as fh:
                summ = list(csv.DictReader(fh))[0]
            assert int(summ["ok"]) == 12 and int(summ["errors"]) == 0
            assert float(summ["p95_ms"]) >= float(summ["p50_ms"]) >= 0
            assert float(summ["req_per_min"]) > 0
        finally:
            srv.shutdown()

    def test_errors_counted_not_raised(self, tmp_path, monkeypatch):
        pp = load_script("profile_pipeline")
        out = str(tmp_path / "prof")
        monkeypatch.setattr(
            sys, "argv",
            ["profile_pipeline.py", "--url", "http://127.0.0.1:9",  # dead
             "--requests", "3", "--concurrency", "2", "--out-dir", out,
             "--run-id", "t2", "--timeout", "1"],
        )
        pp.main()
        with open(os.path.join(out, "summary.csv")) as fh:
            summ = list(csv.DictReader(fh))[0]
        assert int(summ["errors"]) == 3 and int(summ["ok"]) == 0


class TestCreateTestDocs:
    def test_tiny_corpus_artifacts(self, tmp_path, monkeypatch):
        """flat + --tokens: doc store, index npz, doc_tokens + mask all
        written and loadable (the fused-pipeline input contract)."""
        ctd = load_script("create_test_docs")
        out = str(tmp_path / "corpus")
        monkeypatch.setattr(
            sys, "argv",
            ["create_test_docs.py", "--out-dir", out, "--num-docs", "64",
             "--dim", "32", "--kind", "flat", "--backend", "sqlite",
             "--tokens", "--doc-tok-len", "8"],
        )
        ctd.main()
        assert os.path.exists(os.path.join(out, "documents.db"))
        files = os.listdir(out)
        assert any(f.endswith(".npz") for f in files), files
        toks = np.load(os.path.join(out, "doc_tokens.npy"))
        mask = np.load(os.path.join(out, "doc_tokens_mask.npy"))
        assert toks.shape == (64, 8) == mask.shape
        assert set(np.unique(mask)) <= {0, 1}

    def test_synth_doc_deterministic_ids(self):
        ctd = load_script("create_test_docs")
        rng = np.random.default_rng(0)
        i, title, content = ctd.synth_doc(7, rng)
        assert i == 7 and "7" in title and "Reference item 7" in content


class TestAnalyzeExperiments:
    def test_consolidation(self, tmp_path, monkeypatch):
        ae = load_script("analyze_experiments")
        root = tmp_path / "experiments"
        for run, (thr, p50, p95) in {
            "exp_a": (40.0, 900, 2600), "exp_b": (70.0, 500, 1200),
        }.items():
            d = root / run
            d.mkdir(parents=True)
            with open(d / "summary.csv", "w", newline="") as fh:
                w = csv.DictWriter(
                    fh, fieldnames=["run_id", "req_per_min", "p50_ms", "p95_ms"]
                )
                w.writeheader()
                w.writerow({"run_id": run, "req_per_min": thr,
                            "p50_ms": p50, "p95_ms": p95})
        rows = ae.load_runs(str(root))
        assert {r["experiment"] for r in rows} == {"exp_a", "exp_b"}
        out = tmp_path / "analysis"
        monkeypatch.setattr(
            sys, "argv",
            ["analyze_experiments.py", "--root", str(root), "--out", str(out)],
        )
        ae.main()
        with open(out / "consolidated_results.csv") as fh:
            got = list(csv.DictReader(fh))
        assert len(got) == 2

    def test_empty_root_is_graceful(self, tmp_path, monkeypatch, capsys):
        ae = load_script("analyze_experiments")
        monkeypatch.setattr(
            sys, "argv",
            ["analyze_experiments.py", "--root", str(tmp_path / "none"),
             "--out", str(tmp_path / "out")],
        )
        ae.main()
        assert "no runs" in capsys.readouterr().out


class TestCaptureMetrics:
    def test_scrape_node_parses_prometheus_text(self, monkeypatch):
        cm = load_script("capture_metrics")
        text = (
            "# HELP pipeline_requests_total x\n"
            'pipeline_requests_total{node="0",service="gateway"} 42.0\n'
            'pipeline_batch_size_bucket{le="4"} 7\n'
            "unrelated_metric 1.0\n"
            "pipeline_memory_rss_bytes 123456\n"
            "garbage line without value\n"
        )

        class Resp:
            def read(self):
                return text.encode()

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        monkeypatch.setattr(
            cm.urllib.request, "urlopen", lambda url, timeout: Resp()
        )
        rows = cm.scrape_node("http://x:8000")
        metrics = {r["metric"].split("{")[0] for r in rows}
        assert "pipeline_requests_total" in metrics
        assert "unrelated_metric" not in metrics
        vals = {r["metric"].split("{")[0]: r["value"] for r in rows}
        assert vals["pipeline_memory_rss_bytes"] == 123456


class TestSyncRequirements:
    def test_requirements_in_sync(self, tmp_path, monkeypatch):
        sr = load_script("sync_requirements")
        # run against the real pyproject but write to a temp copy
        import shutil

        repo = tmp_path / "repo"
        repo.mkdir()
        shutil.copy(
            os.path.join(SCRIPTS, "..", "pyproject.toml"),
            repo / "pyproject.toml",
        )
        monkeypatch.setattr(sr, "REPO", str(repo))
        sr.main()
        gen = open(repo / "requirements.txt").read()
        committed = open(
            os.path.join(SCRIPTS, "..", "requirements.txt")
        ).read()
        assert gen == committed, "requirements.txt drifted from pyproject"


class TestConvertHFCheckpoint:
    def test_convert_and_validate_tiny_qwen(self, tmp_path, monkeypatch):
        """HF snapshot dir -> framework weights layout, validated by a
        forward pass through the converted weights (offline path)."""
        import jax.numpy as jnp
        import torch
        import transformers
        from safetensors.torch import save_file

        from rag_inference_pipeline_tpu.models.qwen import QwenConfig

        src = tmp_path / "snapshot"
        src.mkdir()
        cfg_hf = transformers.Qwen2Config(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=128, max_position_embeddings=256,
            tie_word_embeddings=True,
        )
        torch.manual_seed(0)
        hf = transformers.Qwen2ForCausalLM(cfg_hf).eval()
        state = {
            k: v.clone().contiguous() for k, v in hf.state_dict().items()
        }
        save_file(state, str(src / "model.safetensors"))
        (src / "tokenizer.json").write_text("{}")  # copied verbatim

        tiny = QwenConfig(
            vocab_size=512, hidden=64, layers=2, heads=4, kv_heads=2,
            head_dim=16, intermediate=128, tie_embeddings=True, max_len=256,
        )
        monkeypatch.setattr(QwenConfig, "qwen25_05b", staticmethod(lambda: tiny))
        conv = load_script("convert_hf_checkpoint")
        monkeypatch.setattr(
            sys, "argv",
            ["convert_hf_checkpoint.py", str(src), "tiny/qwen",
             "--weights-dir", str(tmp_path / "weights"), "--arch", "qwen"],
        )
        conv.main()
        dst = tmp_path / "weights" / "tiny__qwen"
        assert (dst / "model.safetensors").exists()
        assert (dst / "tokenizer.json").exists()

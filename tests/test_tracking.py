"""Experiment-tracker tests: local resume-by-key / latest lookup / asset
round-trip, the HTTP tracker against an in-process Comet-style REST server
(loopback — the protocol is fully exercised without egress), fan-out, and the
weight-fetcher parity path (reference features/environment.py:87-127)."""

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from deepbedmap_tpu.utils.tracking import (
    HTTPTracker,
    LocalTracker,
    MultiTracker,
    download_model_weights,
)


def test_local_tracker_roundtrip_and_resume(tmp_path):
    root = str(tmp_path / "experiments")
    t = LocalTracker(root)
    key = t.experiment_key
    t.log_params({"num_residual_blocks": 12, "residual_scaling": 0.2})
    t.log_metrics({"rmse_test": 50.0}, step=1)
    t.set_model_graph("digraph {}")
    t.end()

    # resume-by-key (ExistingExperiment equivalent): appends, same identity
    t2 = LocalTracker(root, experiment_key=key)
    t2.log_metrics({"rmse_test": 40.0}, step=2)
    assert t2.experiment_key == key
    assert t2.params()["num_residual_blocks"] == 12
    steps = [m["step"] for m in t2.metrics()]
    assert steps == [1, 2]


def test_local_tracker_latest_and_asset_fetch(tmp_path):
    root = str(tmp_path / "experiments")
    old = LocalTracker(root)
    old.log_params({"generation": "old"})
    new = LocalTracker(root)
    new.log_params({"generation": "new"})
    weights = tmp_path / "w.npz"
    np.savez(weights, a=np.arange(3))
    new.log_asset(str(weights), name="srgan_generator_model_weights.npz")

    latest = LocalTracker.latest(root)
    assert latest.experiment_key == new.experiment_key
    assert latest.asset_list() == ["srgan_generator_model_weights.npz"]

    out = str(tmp_path / "out" / "w.npz")
    params = download_model_weights(
        root, "latest", "srgan_generator_model_weights.npz", out
    )
    assert params["generation"] == "new"
    assert np.load(out)["a"].tolist() == [0, 1, 2]


class _Store:
    def __init__(self):
        self.experiments = {}  # key -> {"created_ts", "records": [], "assets": {}}


def _make_handler(store: _Store):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def do_POST(self):
            parts = self.path.strip("/").split("/")
            if parts == ["experiments"]:
                rec = json.loads(self._body())
                store.experiments.setdefault(
                    rec["key"], {"created_ts": rec["ts"], "records": [], "assets": {}}
                )
                return self._json({"ok": True})
            if len(parts) == 3 and parts[2] == "records":
                store.experiments[parts[1]]["records"].append(json.loads(self._body()))
                return self._json({"ok": True})
            self._json({"error": "not found"}, 404)

        def do_PUT(self):
            parts = self.path.strip("/").split("/")
            if len(parts) == 4 and parts[2] == "assets":
                store.experiments[parts[1]]["assets"][parts[3]] = self._body()
                return self._json({"ok": True})
            self._json({"error": "not found"}, 404)

        def do_GET(self):
            parts = self.path.strip("/").split("/")
            if parts == ["experiments"]:
                return self._json(
                    {
                        "experiments": [
                            {"key": k, "created_ts": v["created_ts"]}
                            for k, v in store.experiments.items()
                        ]
                    }
                )
            if len(parts) == 3 and parts[2] == "params":
                params = {}
                for rec in store.experiments[parts[1]]["records"]:
                    if rec["type"] == "params":
                        params.update(rec["params"])
                return self._json(params)
            if len(parts) == 3 and parts[2] == "assets":
                return self._json(
                    {"assets": sorted(store.experiments[parts[1]]["assets"])}
                )
            if len(parts) == 4 and parts[2] == "assets":
                blob = store.experiments[parts[1]]["assets"][parts[3]]
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)
                return
            self._json({"error": "not found"}, 404)

    return Handler


@pytest.fixture
def tracker_server():
    store = _Store()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(store))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}", store
    server.shutdown()
    thread.join(timeout=5)


def test_http_tracker_full_protocol(tracker_server, tmp_path):
    base, store = tracker_server
    t = HTTPTracker(base, api_key="secret")
    t.log_params({"num_residual_blocks": 12})
    t.log_metrics({"rmse_test": 42.0}, step=3)
    weights = tmp_path / "w.npz"
    np.savez(weights, b=np.ones(2))
    t.log_asset(str(weights), name="srgan_generator_model_weights.npz")
    t.set_model_graph("digraph {}")
    t.end()

    recs = store.experiments[t.experiment_key]["records"]
    assert [r["type"] for r in recs] == ["params", "metrics", "graph", "end"]
    assert t.params() == {"num_residual_blocks": 12}
    assert t.asset_list() == ["srgan_generator_model_weights.npz"]

    out = str(tmp_path / "fetched.npz")
    t.fetch_asset("srgan_generator_model_weights.npz", out)
    assert np.load(out)["b"].tolist() == [1.0, 1.0]


def test_http_weight_fetcher_latest(tracker_server, tmp_path):
    base, store = tracker_server
    old = HTTPTracker(base)
    old.log_params({"generation": "old"})
    store.experiments[old.experiment_key]["created_ts"] -= 100.0  # force older
    new = HTTPTracker(base)
    new.log_params({"generation": "new", "num_residual_blocks": 12})
    weights = tmp_path / "w.npz"
    np.savez(weights, c=np.zeros(1))
    new.log_asset(str(weights), name="srgan_generator_model_weights.npz")

    out = str(tmp_path / "dl" / "w.npz")
    params = download_model_weights(
        base, "latest", "srgan_generator_model_weights.npz", out
    )
    assert params["generation"] == "new"
    assert os.path.exists(out)


def test_multi_tracker_fans_out(tracker_server, tmp_path):
    base, store = tracker_server
    local = LocalTracker(str(tmp_path / "exp"))
    remote = HTTPTracker(base, experiment_key=local.experiment_key)
    multi = MultiTracker([local, remote])
    multi.log_metrics({"loss": 1.0}, step=0)
    assert local.metrics()[0]["metrics"]["loss"] == 1.0
    recs = store.experiments[remote.experiment_key]["records"]
    assert recs[0]["metrics"]["loss"] == 1.0


def test_api_from_experiment_rebuilds_model(tmp_path):
    """End-to-end weight-fetcher parity (reference deepbedmap.py:381-410):
    export generator weights in the reference npz format, upload as a tracker
    asset with the run's hyperparameters, then DeepBedMap.from_experiment
    ('latest') must rebuild a generator whose forward matches the original."""
    import jax.numpy as jnp

    from deepbedmap_tpu.api import DeepBedMap
    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.models import build_generator
    from deepbedmap_tpu.train.checkpoint import export_generator_npz

    cfg = GeneratorConfig(num_residual_blocks=1, residual_scaling=0.25)
    model, params = build_generator(cfg, lr=11)
    npz = tmp_path / "srgan_generator_model_weights.npz"
    export_generator_npz(params, str(npz))

    root = str(tmp_path / "experiments")
    t = LocalTracker(root)
    t.log_params(
        {"num_residual_blocks": 1, "residual_scaling": 0.25, "generator_lr": 1.6e-4}
    )
    t.log_asset(str(npz))

    dbm = DeepBedMap.from_experiment(
        root, "latest", download_path=str(tmp_path / "dl" / npz.name)
    )
    assert dbm.cfg.num_residual_blocks == 1
    assert dbm.cfg.residual_scaling == 0.25

    rs = np.random.RandomState(0)
    args = (
        jnp.asarray(rs.rand(1, 11, 11, 1), jnp.float32),
        jnp.asarray(rs.rand(1, 110, 110, 1), jnp.float32),
        jnp.asarray(rs.rand(1, 22, 22, 2), jnp.float32),
        jnp.asarray(rs.rand(1, 11, 11, 1), jnp.float32),
    )
    want = np.asarray(model.apply({"params": params}, *args))
    got = np.asarray(dbm.model.apply({"params": dbm.params}, *args))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fetch_with_bad_key_does_not_poison_latest(tmp_path):
    """Regression: a fetch with a typo'd key must raise without minting a
    junk experiment — previously it created <root>/<typo>/ with the newest
    timestamp, permanently hijacking 'latest' resolution."""
    root = str(tmp_path / "experiments")
    real = LocalTracker(root)
    real.log_params({"generation": "real"})
    weights = tmp_path / "w.npz"
    np.savez(weights, a=np.arange(2))
    real.log_asset(str(weights), name="srgan_generator_model_weights.npz")

    with pytest.raises(FileNotFoundError):
        download_model_weights(
            root, "typo-key", "srgan_generator_model_weights.npz",
            str(tmp_path / "out.npz"),
        )
    # 'latest' still resolves to the real experiment
    assert LocalTracker.latest(root).experiment_key == real.experiment_key
    params = download_model_weights(
        root, "latest", "srgan_generator_model_weights.npz",
        str(tmp_path / "out.npz"),
    )
    assert params["generation"] == "real"

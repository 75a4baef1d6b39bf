"""Aux systems: autoanchor, hyp presets, checkpoint round-trip, loggers,
callbacks, increment_path, plots smoke."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from yolov5_tpu.utils.autoanchor import anchor_fitness, check_anchors, kmean_anchors
from yolov5_tpu.utils.callbacks import Callbacks
from yolov5_tpu.utils.general import check_dataset, check_img_size, increment_path
from yolov5_tpu.utils.hyp import PRESETS, load_hyp
from yolov5_tpu.utils.loggers import CSVLogger


def test_kmean_anchors_recover_clusters(rng):
    """Three planted wh clusters -> evolved anchors land near them."""
    centers = np.array([[10, 12], [40, 35], [120, 100]], float)
    wh = np.concatenate([c * rng.uniform(0.9, 1.1, (200, 2)) for c in centers])
    k = kmean_anchors(wh, n=3, gen=100, verbose=False)
    assert k.shape == (3, 2)
    for c in centers:
        d = np.abs(k - c).sum(1).min()
        assert d < c.sum() * 0.35, (k, c)
    # fitness of recovered anchors is high
    assert anchor_fitness(k, wh, 1 / 4.0) > 0.8


def test_check_anchors_keeps_good(rng):
    class FakeModel:
        anchors = (((10, 13), (16, 30), (33, 23)),
                   ((30, 61), (62, 45), (59, 119)),
                   ((116, 90), (156, 198), (373, 326)))

    class FakeDs:
        # labels normalized xywh matching the coco anchor range
        labels = [np.array([[0, 0.5, 0.5, w, h]], np.float32)
                  for w, h in rng.uniform(0.05, 0.5, (50, 2))]

    out = check_anchors(FakeDs(), FakeModel(), imgsz=640, verbose=False)
    assert out == FakeModel.anchors  # BPR fine -> unchanged


def test_hyp_presets():
    h = load_hyp(None)
    assert h["lr0"] == 0.01 and h["anchor_t"] == 4.0
    assert load_hyp("scratch-med")["mixup"] == 0.1
    assert load_hyp({"lr0": 0.5})["lr0"] == 0.5
    assert set(PRESETS) >= {"scratch-low", "scratch-med", "scratch-high",
                            "VOC", "Objects365"}
    # evolved presets carry the reference GA values (data/hyps/hyp.VOC.yaml)
    assert abs(load_hyp("hyp.VOC")["lr0"] - 0.00334) < 1e-9
    assert abs(load_hyp("Objects365")["momentum"] - 0.779) < 1e-9


def test_checkpoint_roundtrip(tmp_path):
    from yolov5_tpu.train.trainer import TrainState
    from yolov5_tpu.train.optim import EMAState
    from yolov5_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint, variables_from_checkpoint)

    params = {"layer": {"kernel": np.ones((3, 3), np.float32)}}
    stats = {"layer": {"mean": np.zeros(3, np.float32)}}
    ema = EMAState(params={"layer": {"kernel": np.full((3, 3), 2.0, np.float32)}},
                   batch_stats=stats, updates=jnp.asarray(7))
    state = TrainState(jnp.asarray(5), params, stats, None, ema)

    class FakeModel:
        cfg = {"nc": 1}
        nc = 1
        names = {0: "thing"}
        stride = (8, 16, 32)

    p = tmp_path / "x.ckpt"
    save_checkpoint(p, state, FakeModel(), epoch=3, best_fitness=0.5)
    payload, meta = load_checkpoint(p)
    assert meta["epoch"] == 3 and meta["best_fitness"] == 0.5
    v = variables_from_checkpoint(payload, prefer_ema=True)
    np.testing.assert_allclose(v["params"]["layer"]["kernel"], 2.0)
    v2 = variables_from_checkpoint(payload, prefer_ema=False)
    np.testing.assert_allclose(v2["params"]["layer"]["kernel"], 1.0)


def test_callbacks_bus():
    cb = Callbacks()
    seen = []
    cb.register_action("on_train_start", "t", lambda **k: seen.append(k))
    cb.run("on_train_start", epoch=1)
    assert seen == [{"epoch": 1}]
    with pytest.raises(AssertionError):
        cb.run("not_a_hook")


def test_csv_logger(tmp_path):
    log = CSVLogger(tmp_path / "r.csv")
    log.log({"a": 1, "b": 2.5})
    log.log({"a": 2, "b": 3.5})
    text = (tmp_path / "r.csv").read_text().strip().splitlines()
    assert text[0] == "a,b" and len(text) == 3


def test_increment_path(tmp_path):
    p1 = increment_path(tmp_path / "exp", mkdir=True)
    p2 = increment_path(tmp_path / "exp", mkdir=True)
    assert p1.name == "exp" and p2.name == "exp2"


def test_check_img_size():
    assert check_img_size(640, 32) == 640
    assert check_img_size(630, 32) == 640


def test_check_dataset_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        check_dataset({"train": str(tmp_path / "nope"), "nc": 1})
    d = tmp_path / "imgs"
    d.mkdir()
    out = check_dataset({"train": str(d), "names": ["a", "b"]})
    assert out["nc"] == 2 and out["names"] == {0: "a", 1: "b"}


def test_plots_smoke(tmp_path, rng):
    from yolov5_tpu.utils.plots import (
        plot_confusion_matrix, plot_images, plot_labels, plot_pr_curve,
        plot_results)

    csv = tmp_path / "results.csv"
    csv.write_text("step,train/loss,val/map\n0,1.0,0.1\n1,0.5,0.3\n")
    plot_results(csv)
    assert (tmp_path / "results.png").exists()

    labels = [np.array([[0, 0.5, 0.5, 0.2, 0.2], [1, 0.3, 0.3, 0.1, 0.4]])]
    plot_labels(labels, {0: "a", 1: "b"}, tmp_path)
    assert (tmp_path / "labels.png").exists()

    px = np.linspace(0, 1, 100)
    plot_pr_curve(px, np.stack([1 - px, 1 - px * 0.5]), [0.5, 0.75],
                  ["a", "b"], tmp_path / "pr.png")
    assert (tmp_path / "pr.png").exists()

    plot_confusion_matrix(np.array([[5.0, 1, 0], [1, 3, 0], [0, 1, 0]]),
                          ["a", "b"], tmp_path / "cm.png")
    assert (tmp_path / "cm.png").exists()

    ims = rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    t = np.zeros((4, 2, 5), np.float32)
    t[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    v = np.zeros((4, 2), bool)
    v[:, 0] = True
    plot_images(ims, t, v, tmp_path / "batch.png")
    assert (tmp_path / "batch.png").exists()


def test_plot_evolve(tmp_path, rng):
    from yolov5_tpu.train.evolve import META
    from yolov5_tpu.utils.plots import plot_evolve

    import csv as csvmod
    csv_path = tmp_path / "evolve.csv"
    with open(csv_path, "w", newline="") as f:
        w = csvmod.DictWriter(f, fieldnames=["fitness"] + list(META))
        w.writeheader()
        for _ in range(12):
            w.writerow({"fitness": rng.random(),
                        **{k: rng.random() for k in META}})
    out = plot_evolve(csv_path)
    assert (tmp_path / "evolve.png").exists()


def test_freeze_mask_and_optimizer(rng):
    import optax
    import jax
    import jax.numpy as jnp
    from yolov5_tpu.train.optim import build_optimizer, freeze_mask

    params = {"layers_0": {"conv": {"kernel": jnp.ones((3, 3, 4, 8))}},
              "layers_1": {"conv": {"kernel": jnp.ones((3, 3, 8, 8))}},
              "layers_10": {"conv": {"kernel": jnp.ones((1, 1, 8, 8))}}}
    mask = freeze_mask(params, 2)
    assert mask["layers_0"]["conv"]["kernel"] is True
    assert mask["layers_1"]["conv"]["kernel"] is True
    assert mask["layers_10"]["conv"]["kernel"] is False  # 10 != prefix of 0/1

    hyp = {"lr0": 0.1, "lrf": 1.0, "weight_decay": 0.0, "warmup_epochs": 0.0}
    tx = build_optimizer(params, hyp, epochs=1, steps_per_epoch=1,
                         batch_size=64, freeze=2)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    # two updates: at step 0 warmup LR is exactly 0 for every group
    updates, state = tx.update(grads, state, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["layers_0"]["conv"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["layers_1"]["conv"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["layers_10"]["conv"]["kernel"]).sum()) > 0.0


def test_image_weights_resampling(tmp_path, rng):
    from yolov5_tpu.data.dataset import Loader, YOLODataset
    from yolov5_tpu.data.synthetic import generate_shapes_dataset

    cfg = generate_shapes_dataset(tmp_path / "iw", n_images=10, img_size=96, seed=0)
    ds = YOLODataset(cfg["train"], img_size=96)
    loader = Loader(ds, batch_size=2, shuffle=True, seed=0, workers=1)
    w = np.zeros(len(ds))
    w[3] = 1.0  # everything sampled from image 3
    loader.set_image_weights(w, epoch=0)
    idx = loader._indices(0)
    assert (idx == 3).all()


def test_ram_cache(tmp_path):
    from yolov5_tpu.data.dataset import YOLODataset
    from yolov5_tpu.data.synthetic import generate_shapes_dataset

    cfg = generate_shapes_dataset(tmp_path / "rc", n_images=3, img_size=96, seed=0)
    ds = YOLODataset(cfg["train"], img_size=96, cache="ram")
    im1, _, _ = ds.load_image(0)
    assert 0 in ds._ram
    im2, _, _ = ds.load_image(0)
    np.testing.assert_array_equal(im1, im2)


def test_trace_op_table(tmp_path):
    """trace() + trace_op_table give a per-fusion time table (the reference's
    torch_utils.profile role, truthful at XLA-fusion granularity)."""
    import jax

    from yolov5_tpu.utils.profile import trace, trace_op_table

    f = jax.jit(lambda a: (a @ a).sum())
    x = jnp.ones((256, 256), jnp.float32)
    _ = float(f(x))  # compile outside the trace
    with trace(tmp_path):
        _ = float(f(x))
    rows = trace_op_table(tmp_path, top=10)
    assert rows and all(len(r) == 3 for r in rows)
    assert any(ms >= 0 for _, _, ms in rows)


def test_cloud_logger_adapters_with_fake_sdks(monkeypatch, tmp_path):
    """W&B/ClearML/Comet sinks activate on import success (the reference's
    try-import pattern, utils/loggers/__init__.py) — exercised with injected
    fake SDK modules since the real ones need egress."""
    import sys
    import types

    from yolov5_tpu.utils import loggers as L

    events = {"wandb": [], "clearml": [], "comet": []}

    wandb = types.ModuleType("wandb")
    wandb.run = None

    class _Run:
        id = "abc"

        def log(self, row, step=None):
            events["wandb"].append(("log", dict(row), step))

        def log_artifact(self, art, aliases=None):
            events["wandb"].append(("artifact", art.files, aliases))

        def finish(self):
            events["wandb"].append(("finish",))

    class _Art:
        def __init__(self, name, type, metadata=None):
            self.files = []
            self.metadata = metadata or {}

        def add_file(self, p, name=None):
            self.files.append(p)

        def add_dir(self, p, name=None):
            self.files.append(p)

    wandb.init = lambda **kw: _Run()
    wandb.Artifact = _Art

    clearml = types.ModuleType("clearml")

    class _TaskLogger:
        def report_scalar(self, title, series, v, step):
            events["clearml"].append((title, series, v, step))

    class _Task:
        @staticmethod
        def init(**kw):
            return _Task()

        def connect(self, cfg):
            pass

        def get_logger(self):
            return _TaskLogger()

        def update_output_model(self, model_path, model_name=None,
                                auto_delete_file=True):
            events["clearml"].append(("model", model_path))

        def connect_configuration(self, cfg, name=None):
            events["clearml"].append(("dataset", dict(cfg)))

        def close(self):
            events["clearml"].append(("close",))

    clearml.Task = _Task

    comet = types.ModuleType("comet_ml")

    class _Exp:
        def __init__(self, **kw):
            pass

        def set_name(self, n):
            pass

        def log_parameters(self, p):
            pass

        def log_metrics(self, m, step=None):
            events["comet"].append(("metrics", dict(m), step))

        def log_model(self, name, path, file_name=None, metadata=None):
            events["comet"].append(("model", path))

        def log_asset(self, path):
            events["comet"].append(("asset", path))

        def log_others(self, d):
            events["comet"].append(("others", dict(d)))

        def end(self):
            events["comet"].append(("end",))

    comet.Experiment = _Exp

    monkeypatch.setitem(sys.modules, "wandb", wandb)
    monkeypatch.setitem(sys.modules, "clearml", clearml)
    monkeypatch.setitem(sys.modules, "comet_ml", comet)

    lg = L.Loggers(tmp_path / "exp", enable_tb=False, config={"lr0": 0.01})
    assert len(lg.cloud) == 3
    lg.log_metrics({"val/map50": 0.5, "note": "str-skipped"}, step=3)
    ckpt = tmp_path / "best.ckpt"
    ckpt.write_bytes(b"x")
    lg.log_model(ckpt)
    lg.close()

    assert ("log", {"val/map50": 0.5, "note": "str-skipped"}, 3) in events["wandb"]
    assert ("val", "map50", 0.5, 3) in events["clearml"]
    assert ("metrics", {"val/map50": 0.5}, 3) in events["comet"]
    assert any(e[0] == "artifact" for e in events["wandb"])
    assert ("model", str(ckpt)) in events["clearml"]
    assert ("finish",) in events["wandb"] and ("end",) in events["comet"]

    # env kill-switch
    monkeypatch.setenv("YOLOV5_TPU_LOGGERS", "off")
    assert L.Loggers(tmp_path / "exp2", enable_tb=False).cloud == []
    # selective enable
    monkeypatch.setenv("YOLOV5_TPU_LOGGERS", "comet")
    assert len(L.Loggers(tmp_path / "exp3", enable_tb=False).cloud) == 1


def test_wandb_model_artifact_aliases_and_dataset(monkeypatch, tmp_path):
    """Model artifacts carry training metadata + latest/last/epoch-N/best
    aliases, and --upload-dataset logs a dataset artifact (reference
    wandb_utils.py:96-130 log_model, log_dataset_artifact role)."""
    import sys
    import types

    from yolov5_tpu.utils import loggers as L

    logged = []

    class _Art:
        def __init__(self, name, type, metadata=None):
            self.name, self.type, self.metadata = name, type, metadata or {}
            self.files = []

        def add_file(self, p, name=None):
            self.files.append((p, name))

        def add_dir(self, p, name=None):
            self.files.append((p, name))

    class _Run:
        id = "r1"

        def log_artifact(self, art, aliases=None):
            logged.append((art, aliases))

        def finish(self):
            pass

    wandb = types.ModuleType("wandb")
    wandb.run = None
    wandb.init = lambda **kw: _Run()
    wandb.Artifact = _Art
    monkeypatch.setitem(sys.modules, "wandb", wandb)

    sink = L.WandbLogger(tmp_path / "exp")
    ckpt = tmp_path / "last.ckpt"
    ckpt.write_bytes(b"x")
    sink.log_model(ckpt, epoch=3, fitness=0.42, best=True,
                   opt={"epochs": 10, "project": "runs/train"})
    art, aliases = logged[-1]
    assert art.type == "model"
    assert set(aliases) >= {"latest", "last", "epoch 3", "best"}
    assert art.metadata["epochs_trained"] == 4
    assert art.metadata["total_epochs"] == 10
    assert art.metadata["fitness_score"] == 0.42

    # non-best epoch: no 'best' alias
    sink.log_model(ckpt, epoch=4, fitness=0.1, best=False, opt={})
    assert "best" not in logged[-1][1]

    # dataset artifact: yaml + split dirs
    (tmp_path / "images").mkdir()
    yml = tmp_path / "data.yaml"
    yml.write_text("train: images\n")
    sink.log_dataset({"train": str(tmp_path / "images"), "nc": 2,
                      "names": {0: "a", 1: "b"}}, yaml_file=yml)
    art, _ = logged[-1]
    assert art.type == "dataset"
    assert len(art.files) == 2  # yaml + train dir


def test_check_comet_resume(monkeypatch, tmp_path):
    """comet:// resume rehydrates opt.yaml and downloads the newest model
    checkpoint (reference comet_utils.py:21-120)."""
    import sys
    import types

    import yaml as _yaml

    from yolov5_tpu.utils import loggers as L

    opt_saved = {"data": "shapes.yaml", "cfg": "yolov5n", "epochs": 7,
                 "resume": "stale"}
    assets = {"a1": _yaml.safe_dump(opt_saved).encode(),
              "m-new": b"CKPT-NEW", "m-old": b"CKPT-OLD"}

    class _Exp:
        name = "exp9"

        def get_asset_list(self):
            return [{"fileName": "opt.yaml", "assetId": "a1"}]

        def get_model_asset_list(self, model_name):
            assert model_name == "yolov5_tpu"
            return [{"fileName": "last.ckpt", "assetId": "m-old", "step": 3},
                    {"fileName": "last.ckpt", "assetId": "m-new", "step": 9}]

        def get_asset(self, asset_id, return_type="binary", stream=False):
            return assets[asset_id]

    comet = types.ModuleType("comet_ml")

    class _API:
        def get(self, path):
            assert path == "ws/proj/exp9"
            return _Exp()

    comet.API = _API
    monkeypatch.setitem(sys.modules, "comet_ml", comet)

    assert L.check_comet_resume("runs/train/x", "runs/train") is None
    got = L.check_comet_resume("comet://ws/proj/exp9",
                               project=str(tmp_path / "runs"))
    assert got is not None
    opt, ckpt = got
    assert opt["epochs"] == 7 and opt["cfg"] == "yolov5n"
    # newest-step asset wins
    assert Path(ckpt).read_bytes() == b"CKPT-NEW"
    assert Path(ckpt).name == "last.ckpt"


def test_check_wandb_resume(monkeypatch, tmp_path):
    """wandb-artifact:// resume downloads the model artifact and picks its
    last.ckpt."""
    import sys
    import types

    from yolov5_tpu.utils import loggers as L

    dl = tmp_path / "dl"

    class _Artifact:
        def download(self, root=None):
            dl.mkdir(parents=True, exist_ok=True)
            (dl / "last.ckpt").write_bytes(b"W")
            return str(dl)

    class _Api:
        def artifact(self, path, type=None):
            assert path == "ent/proj/run_r1_model:latest"
            return _Artifact()

    wandb = types.ModuleType("wandb")
    wandb.Api = _Api
    monkeypatch.setitem(sys.modules, "wandb", wandb)

    assert L.check_wandb_resume("runs/train/x") is None
    p = L.check_wandb_resume("wandb-artifact://ent/proj/run_r1_model:latest",
                             project=str(tmp_path / "runs"))
    assert Path(p).read_bytes() == b"W"


def test_construct_clearml_dataset(monkeypatch, tmp_path):
    """clearml:// --data materializes the dataset version and resolves its
    yaml definition (reference clearml_utils.py:41-81), end-to-end through
    check_dataset."""
    import sys
    import types

    root = tmp_path / "ds"
    (root / "images" / "train").mkdir(parents=True)
    (root / "images" / "val").mkdir(parents=True)
    (root / "def.yaml").write_text(
        "train: images/train\nval: images/val\nnc: 2\nnames: [a, b]\n")

    clearml = types.ModuleType("clearml")

    class _DS:
        @staticmethod
        def get(dataset_id):
            assert dataset_id == "abc123"
            return _DS()

        def get_local_copy(self):
            return str(root)

    clearml.Dataset = _DS
    monkeypatch.setitem(sys.modules, "clearml", clearml)

    from yolov5_tpu.utils.general import check_dataset

    d = check_dataset("clearml://abc123")
    assert d["nc"] == 2 and d["names"] == {0: "a", 1: "b"}
    assert d["train"] == str((root / "images" / "train").resolve())
    assert d["val"] == str((root / "images" / "val").resolve())

    # two yamls in the root is ambiguous -> error
    (root / "other.yaml").write_text("x: 1\n")
    import pytest as _pytest

    from yolov5_tpu.utils.loggers import construct_clearml_dataset

    with _pytest.raises(ValueError):
        construct_clearml_dataset("clearml://abc123")


def test_hpo_local_sampler_and_sweep(tmp_path):
    """Local HPO driver (reference comet hpo.py analog): the sampler
    respects domains, grid enumerates the product, and run_sweep merges
    params into hyps, applies epochs/batch_size overrides, writes hpo.csv
    and picks the best trial."""
    from yolov5_tpu.train.hpo import run_sweep, sample_parameters

    config = {
        "algorithm": "random",
        "spec": {"metric": "fitness", "objective": "maximize", "maxCombo": 6},
        "parameters": {
            "lr0": {"type": "float", "min": 0.001, "max": 0.1},
            "box": {"type": "discrete", "values": [0.02, 0.2]},
            "epochs": {"type": "discrete", "values": [3]},
            "batch_size": {"type": "discrete", "values": [8]},
        },
    }
    draws = list(sample_parameters(config, seed=0))
    assert len(draws) == 6
    assert all(0.001 <= p["lr0"] <= 0.1 for p in draws)
    assert all(p["box"] in (0.02, 0.2) for p in draws)
    # deterministic under the same seed
    assert draws == list(sample_parameters(config, seed=0))

    grid = list(sample_parameters({
        "algorithm": "grid",
        "parameters": {"a": {"values": [1, 2]}, "b": {"values": [10, 20, 30]}},
    }))
    assert len(grid) == 6 and {(g["a"], g["b"]) for g in grid} == {
        (a, b) for a in (1, 2) for b in (10, 20, 30)}

    calls = []

    def fake_train(data, cfg, hyp, epochs, batch_size, imgsz, save_dir,
                   nosave):
        calls.append({"hyp": dict(hyp), "epochs": epochs,
                      "batch_size": batch_size})
        return 0.1 * len(calls), {"fitness": 0.1 * len(calls)}, None

    best_params, best_obj = run_sweep(
        data="d.yaml", sweep=config, cfg="yolov5n", epochs=99, batch_size=99,
        save_dir=tmp_path / "hpo", train_fn=fake_train)
    assert len(calls) == 6
    # sweep's epochs/batch_size override the CLI defaults (reference
    # comet hpo.py run() pops exactly these)
    assert all(c["epochs"] == 3 and c["batch_size"] == 8 for c in calls)
    # sampled values land in the hyp dict, not in opt
    assert all("lr0" in c["hyp"] and "epochs" not in c["hyp"] for c in calls)
    assert best_obj == pytest.approx(0.6)  # last trial scored highest
    lines = (tmp_path / "hpo" / "hpo.csv").read_text().splitlines()
    assert len(lines) == 7 and lines[0].startswith("trial,fitness")
    assert (tmp_path / "hpo" / "hyp_hpo.yaml").exists()


def test_hpo_comet_backend_with_fake_sdk(monkeypatch, tmp_path):
    """--backend comet sources parameter sets from comet_ml.Optimizer
    (reference hpo.py:104-119) instead of the local sampler."""
    import sys
    import types

    from yolov5_tpu.train.hpo import run_sweep

    served = [{"parameters": {"lr0": 0.01, "epochs": 2}},
              {"parameters": {"lr0": 0.05, "epochs": 2}}]

    class _Optimizer:
        def __init__(self, cfg):
            self.cfg = cfg
            self.id = "opt123"

        def get_parameters(self):
            yield from served

    comet = types.ModuleType("comet_ml")
    comet.Optimizer = _Optimizer
    monkeypatch.setitem(sys.modules, "comet_ml", comet)

    seen = []

    def fake_train(data, cfg, hyp, epochs, batch_size, imgsz, save_dir,
                   nosave):
        seen.append((hyp["lr0"], epochs))
        return 0.5, {"fitness": 0.5}, None

    run_sweep(data="d.yaml", sweep={"parameters": {"lr0": {"values": [0]}}},
              save_dir=tmp_path / "hpo", backend="comet", train_fn=fake_train)
    assert seen == [(0.01, 2), (0.05, 2)]

"""Full detection training driver — the `train.py run(**kwargs)` equivalent
(/root/reference/train.py:105-528), re-shaped around one jitted DP train step.

Differences by design:
- no GradScaler/AMP plumbing: bf16 compute + fp32 params natively
- no DDP wrapper/rank gating: a mesh + shardings express data parallelism;
  multi-host runs shard the input stream by jax.process_index()
- checkpoints are data (msgpack pytrees), not pickled code
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from yolov5_tpu.data.dataset import create_loader
from yolov5_tpu.eval.evaluator import evaluate
from yolov5_tpu.models import DetectionModel
from yolov5_tpu.parallel.mesh import make_mesh, prefetch_to_mesh, replicate
from yolov5_tpu.train.loss import ComputeLoss
from yolov5_tpu.train.optim import build_optimizer
from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp
from yolov5_tpu.utils.callbacks import Callbacks
from yolov5_tpu.utils.checkpoint import (
    anchors_from_yaml,
    anchors_to_yaml,
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
    variables_from_checkpoint,
)
from yolov5_tpu.utils.general import check_dataset, check_img_size, increment_path, init_seeds
from yolov5_tpu.utils.hyp import load_hyp
from yolov5_tpu.utils.loggers import Loggers


def multiscale_sizes(imgsz, gs, n=None):
    """Stride-aligned bucket set covering the reference's full multi-scale
    range 0.5-1.5x (train.py:393-398: `randrange(imgsz*0.5, imgsz*1.5+gs)
    // gs * gs`). The reference draws any stride multiple in the range each
    batch; under XLA every distinct size is a compiled program, so the range
    is covered by `n` evenly spaced stride multiples (default 5, override
    with YOLOV5_TPU_MS_BUCKETS; set it to the full multiple count to
    reproduce the reference's unbinned distribution) sampled PER BATCH."""
    import os

    if n is None:
        n = int(os.environ.get("YOLOV5_TPU_MS_BUCKETS", 5))
    lo = max(1, int(round(imgsz * 0.5 / gs)))
    hi = int(round(imgsz * 1.5 / gs))
    ks = np.unique(np.linspace(lo, hi, min(n, hi - lo + 1)).round().astype(int))
    return [int(k * gs) for k in ks]


def multiscale_epoch_plan(idx_epoch, sizes, rng):
    """Stratified per-batch sizes for the device-cached epoch path.

    The whole-epoch lax.scan compiles per (batch-count, size); a naive iid
    per-batch draw would give every epoch different per-size counts and
    recompile forever. Instead each size gets a FIXED count (nb split as
    evenly as possible, remainder pinned to the first sizes — a <=1-batch
    per-epoch bias) and the batch->size assignment reshuffles per epoch.
    Marginally each batch sees a ~uniform size draw like the reference
    (train.py:393-398); exactly len(sizes) compiled programs.

    Yields (size, idx_rows) pairs."""
    nb = len(idx_epoch)
    k = len(sizes)
    order = rng.permutation(nb)
    start = 0
    for i, sz in enumerate(sizes):
        n = nb // k + (1 if i < nb % k else 0)
        if n:
            yield int(sz), idx_epoch[order[start:start + n]]
        start += n


def find_resume_ckpt(resume, project="runs/train"):
    """Resolve --resume into a checkpoint path: True/'auto' -> most recent
    last.ckpt under `project`; a run dir -> its last.ckpt; else the path
    itself (reference get_latest_run, train.py:624)."""
    if resume is True or str(resume).lower() in ("auto", "true", "latest"):
        cands = sorted(Path(project).glob("**/last.ckpt"),
                       key=lambda p: p.stat().st_mtime)
        if not cands:
            raise FileNotFoundError(f"--resume: no last.ckpt found under {project}")
        return cands[-1]
    p = Path(resume)
    if p.is_dir():
        p = p / "last.ckpt"
    if not p.exists():
        raise FileNotFoundError(f"--resume checkpoint not found: {p}")
    return p


class EarlyStopper:
    """Fitness-patience early stop (reference torch_utils.py:315-340)."""

    def __init__(self, patience=100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch, fi):
        if fi >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fi
        return (epoch - self.best_epoch) >= self.patience


def run(
    data,
    cfg="yolov5n",
    hyp=None,
    weights="",
    epochs=100,
    batch_size=16,
    imgsz=640,
    optimizer="sgd",
    cos_lr=False,
    seed=0,
    workers=8,
    max_labels=None,
    single_cls=False,
    patience=100,
    save_dir=None,
    project="runs/train",
    name="exp",
    exist_ok=False,
    nosave=False,
    noval=False,
    save_period=-1,
    device_count=None,
    dtype="bfloat16",
    val_batch_size=None,
    callbacks: Callbacks | None = None,
    resume="",
    freeze=None,
    multi_scale=False,
    image_weights=False,
    cache=None,
    noautoanchor=False,
    device_aug=False,
    quad=False,
    label_smoothing=0.0,
    noplots=False,
    rect=False,
    sync_bn=False,
    upload_dataset=False,
    _resume_ckpt=None,
):
    """Train a detector. Returns (best_fitness, results dict, save_dir)."""
    callbacks = callbacks or Callbacks()
    if resume and _resume_ckpt is None:
        # cloud resume URIs first: comet:// rehydrates opt + downloads the
        # newest checkpoint (reference comet_utils.py check_comet_resume);
        # wandb-artifact:// downloads the model artifact's last.ckpt
        from yolov5_tpu.utils.loggers import (check_comet_resume,
                                              check_wandb_resume)

        comet = check_comet_resume(resume, project)
        if comet is not None:
            saved, ckpt_path = comet
            saved.pop("resume", None)
            print(f"resuming from {resume} -> {ckpt_path}")
            return run(**saved, _resume_ckpt=ckpt_path,
                       save_dir=str(Path(ckpt_path).parent),
                       callbacks=callbacks)
        wb = check_wandb_resume(resume, project)
        if wb is not None:
            resume = wb  # local path now; the run-dir opt.yaml logic below
    if resume and _resume_ckpt is None:
        # rehydrate the interrupted run's own opt.yaml/hyp.yaml so the
        # continuation is config-identical (reference train.py:624-636
        # replaces opt wholesale from the run dir)
        import yaml

        ckpt_path = find_resume_ckpt(resume, project)
        run_dir = ckpt_path.parent
        opt_file, hyp_file = run_dir / "opt.yaml", run_dir / "hyp.yaml"
        if opt_file.exists():
            saved = yaml.safe_load(opt_file.read_text()) or {}
            saved.pop("resume", None)
            if hyp_file.exists():
                saved["hyp"] = str(hyp_file)
            print(f"resuming {run_dir} from epoch {saved.get('epochs', '?')} config")
            return run(**saved, _resume_ckpt=str(ckpt_path),
                       save_dir=str(run_dir), callbacks=callbacks)
        _resume_ckpt = str(ckpt_path)  # pre-opt.yaml checkpoint: caller args
        save_dir = save_dir or str(run_dir)
    init_seeds(seed)
    data_dict = check_dataset(data)
    nc = 1 if single_cls else int(data_dict["nc"])
    opt_dict = {
        k: (str(v) if isinstance(v, Path) else v) for k, v in dict(
            data=data, cfg=cfg, hyp=hyp, weights=weights, epochs=epochs,
            batch_size=batch_size, imgsz=imgsz, optimizer=optimizer,
            cos_lr=cos_lr, seed=seed, workers=workers, max_labels=max_labels,
            single_cls=single_cls, patience=patience, project=project,
            name=name, nosave=nosave, noval=noval, save_period=save_period,
            device_count=device_count, dtype=dtype,
            val_batch_size=val_batch_size, freeze=freeze,
            multi_scale=multi_scale, image_weights=image_weights, cache=cache,
            noautoanchor=noautoanchor, device_aug=device_aug, quad=quad,
            upload_dataset=upload_dataset,
        ).items()
    }
    hyp = load_hyp(hyp)
    if label_smoothing:
        hyp["label_smoothing"] = float(label_smoothing)
    if sync_bn:
        # BN stats are GLOBAL-batch by construction under jit+GSPMD (see
        # PARITY 2.6) — the flag exists for reference CLI compatibility
        print("--sync-bn: cross-device BN stats are always on under GSPMD")

    save_dir = Path(save_dir) if save_dir else increment_path(
        Path(project) / name, exist_ok=exist_ok)
    save_dir.mkdir(parents=True, exist_ok=True)
    # persist run config for --resume rehydration (reference train.py:169-171)
    import yaml

    (save_dir / "hyp.yaml").write_text(yaml.safe_dump(hyp, sort_keys=False))
    (save_dir / "opt.yaml").write_text(yaml.safe_dump(opt_dict, sort_keys=False))
    loggers = Loggers(save_dir)
    # run config assets: what comet:// resume reads back (set_opt_parameters)
    loggers.log_asset(save_dir / "opt.yaml")
    loggers.log_asset(save_dir / "hyp.yaml")
    if upload_dataset:
        loggers.log_dataset(data_dict, yaml_file=data_dict.get("yaml_file"))
    last, best = save_dir / "last.ckpt", save_dir / "best.ckpt"

    # model
    model = DetectionModel(cfg, nc=nc, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    if data_dict.get("names"):
        model.names = {int(k): v for k, v in data_dict["names"].items()}
    imgsz = check_img_size(imgsz, s=max(model.stride))
    start_epoch = 0
    best_fitness = 0.0
    resume_payload = None
    if _resume_ckpt:
        resume_payload, meta = load_checkpoint(_resume_ckpt)
        model.variables = {"params": resume_payload["params"],
                           "batch_stats": resume_payload["batch_stats"]}
        if meta.get("anchors"):
            # restore autoanchor-evolved anchors: the loss/decode must match
            # what the weights were trained with
            model.anchors = anchors_from_yaml(meta["anchors"])
            model.cfg["anchors"] = meta["anchors"]
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_fitness = float(meta.get("best_fitness", 0.0))
        # reference smart_resume semantics (torch_utils.py:296-309): a
        # stripped/finished checkpoint (epoch == -1) cannot be resumed;
        # a horizon already passed means fine-tune for `epochs` more
        assert start_epoch > 0, (
            f"{_resume_ckpt} training is finished, nothing to resume")
        if epochs < start_epoch:
            print(f"{_resume_ckpt} has been trained for {start_epoch - 1} "
                  f"epochs; fine-tuning for {epochs} more epochs")
            epochs += start_epoch - 1
    elif weights:
        if str(weights).endswith(".pt"):  # torch reference checkpoint
            from yolov5_tpu.models.weights import import_torch_weights, load_torch_state_dict

            sd = load_torch_state_dict(weights)
            model.variables, missed = import_torch_weights(model, sd)
            if missed:
                print(f"weight import: {len(missed)} unmatched entries")
        else:
            payload, _ = load_checkpoint(weights)
            model.variables = variables_from_checkpoint(payload, prefer_ema=True)

    # data
    rank, world = jax.process_index(), jax.process_count()
    # with device_aug + mosaic the host only decodes raw 4-tile batches;
    # composition, geometry, HSV and flips all run inside the jitted step
    device_mosaic = device_aug and hyp.get("mosaic", 0) > 0
    if rect and (device_aug or image_weights):
        raise ValueError("--rect training needs the host loader without "
                         "shuffle (reference dataloaders.py:148); drop "
                         "--device-aug/--image-weights or --rect")
    if rect:
        hyp = dict(hyp, mosaic=0.0)  # reference: rect disables mosaic
        device_mosaic = False
    train_ds, train_loader = create_loader(
        data_dict["train"], img_size=imgsz, batch_size=batch_size, augment=True,
        hyp=hyp, workers=workers, max_labels=max_labels, seed=seed,
        shard=(rank, world), single_cls=single_cls, cache=cache,
        device_aug=device_aug, raw_images=device_mosaic, quad=quad,
        rect=rect, shuffle=not rect,
    )
    max_labels = train_loader.max_labels  # resolved if auto
    if not noautoanchor and not _resume_ckpt and not weights:
        from yolov5_tpu.utils.autoanchor import check_anchors

        new_anchors = check_anchors(train_ds, model, thr=hyp.get("anchor_t", 4.0),
                                    imgsz=imgsz)
        if new_anchors != model.anchors:
            model.anchors = new_anchors
            # keep cfg in sync so checkpoints rebuild with evolved anchors
            model.cfg["anchors"] = anchors_to_yaml(new_anchors)
            print("autoanchor: anchors updated")
    val_loader = None
    if data_dict.get("val") and not noval:
        _, val_loader = create_loader(
            data_dict["val"], img_size=imgsz, batch_size=val_batch_size or batch_size,
            augment=False, shuffle=False, workers=workers, max_labels=max_labels,
            single_cls=single_cls,
        )

    nb = len(train_loader)
    if nb == 0:
        raise ValueError(f"train loader is empty for {data_dict.get('train')}")
    if quad and device_aug:
        raise ValueError("--quad composes batches on the host; it is "
                         "redundant with --device-aug mosaic — drop one flag")
    ms_sizes, ms_rng = [], None
    if multi_scale:
        ms_sizes = multiscale_sizes(imgsz, max(model.stride))
        ms_rng = np.random.default_rng(seed + 0x5CA1E)
        print(f"multi-scale: per-batch sizes {ms_sizes}")
    nl = len(model.stride)
    hyp_scaled = scale_hyp(hyp, nl=nl, nc=nc, imgsz=imgsz)
    loss_fn = ComputeLoss(model.anchors_per_stride, nc, hyp_scaled,
                          gain=4.0 if quad else 1.0)
    tx = build_optimizer(model.params, hyp_scaled, epochs=epochs,
                         steps_per_epoch=nb, batch_size=batch_size,
                         name=optimizer, cos_lr=cos_lr, freeze=freeze)
    state = init_train_state(model, tx)
    if resume_payload is not None:
        # momentum buffers, accumulation counters, schedule position, EMA —
        # the loss curve must continue as if never interrupted
        state = restore_train_state(state, resume_payload)
        resume_payload = None

    # device-resident dataset: when the decoded training set fits in HBM,
    # upload it once and ship only (bs,) index vectors per step — the
    # image H2D stream (the dominant recurring transfer) disappears
    use_device_cache = False
    cache_host = None
    if device_mosaic and cache in (None, "device"):
        from yolov5_tpu.data.device_cache import (
            build_cache_arrays,
            cache_nbytes,
            device_memory_budget,
        )

        need = cache_nbytes(train_ds, max_labels)
        if cache == "device" or need <= device_memory_budget():
            train_ds.cache = None  # no host RAM copy on top of the HBM one
            cache_host = build_cache_arrays(train_ds, max_labels)
            use_device_cache = True
            print(f"device cache: {len(train_ds)} images "
                  f"({need / 1e6:.0f} MB) resident in HBM")

    mesh = make_mesh(device_count)
    ms_device = multi_scale and device_mosaic  # sizes drawn inside the step
    epoch_step = epoch_steps = step_fn = step_fns = None
    if use_device_cache:
        from yolov5_tpu.train.trainer import make_epoch_step

        if ms_device:
            # one compiled epoch-scan per stride bucket; the fused mosaic
            # emits its canvas at the bucket size directly (device_aug.py)
            epoch_steps = {sz: make_epoch_step(model, loss_fn, tx, mesh,
                                               device_aug_hyp=hyp, ms_size=sz)
                           for sz in ms_sizes}
        else:
            epoch_step = make_epoch_step(
                model, loss_fn, tx, mesh,
                device_aug_hyp=hyp if device_aug else None)
    elif ms_device:
        step_fns = {sz: make_train_step(model, loss_fn, tx, mesh=mesh,
                                        device_aug_hyp=hyp, ms_size=sz)
                    for sz in ms_sizes}
    else:
        step_fn = make_train_step(model, loss_fn, tx, mesh=mesh,
                                  device_aug_hyp=hyp if device_aug else None)
    stopper = EarlyStopper(patience)
    callbacks.run("on_train_start")
    print(f"training {cfg} on {data_dict.get('train')}: {len(train_ds)} imgs, "
          f"{nb} steps/epoch, {mesh.devices.size} device(s), imgsz {imgsz}")

    results = {}
    t_start = time.time()
    with mesh:
        state = replicate(state, mesh)
        cache_dev = None
        if use_device_cache:
            cache_dev = replicate(cache_host, mesh)
            cache_host = None
        for epoch in range(start_epoch, epochs):
            callbacks.run("on_train_epoch_start")
            train_loader.set_epoch(epoch)
            if image_weights and results.get("per_class") is not None:
                # resample images toward classes with the worst AP
                # (reference train.py:359-362 + labels_to_image_weights)
                from yolov5_tpu.utils.general import labels_to_class_weights

                cw = labels_to_class_weights(train_ds.labels, nc)
                ap_per = results.get("per_class", {})
                err = np.array([cw[c] * (1.0 - ap_per.get(c, (0.0, 0.0))[1])
                                for c in range(nc)])
                iw = np.array([
                    (err[l[:, 0].astype(int)].sum() if len(l) else 0.0)
                    for l in train_ds.labels
                ]) + 1e-6
                train_loader.set_image_weights(iw, epoch)
            agg = None
            t0 = time.time()
            batch_keys = (("images", "hw", "targets", "valid")
                          if device_mosaic else ("images", "targets", "valid"))

            def host_prep(batch):
                batch = {k: batch[k] for k in batch_keys}
                # per-batch multi-scale over the full reference 0.5-1.5x
                # range (train.py:393-398), restricted to a bounded set of
                # stride-aligned buckets so each size compiles exactly once.
                # With device mosaic the resize happens INSIDE the step
                # (ms_device), so the host ships the raw tiles untouched.
                s_b = (int(ms_rng.choice(ms_sizes))
                       if multi_scale and not ms_device else imgsz)
                if s_b != imgsz:
                    import cv2

                    t = s_b * (2 if quad else 1)  # quad batches are 2s x 2s
                    batch["images"] = np.stack(
                        [cv2.resize(im, (t, t), interpolation=cv2.INTER_LINEAR)
                         for im in batch["images"]])
                if not device_aug:
                    im = batch["images"]
                    # pre-pack in the prefetch worker (overlapped with the
                    # device step): the packed stem consumes the folded form
                    # with zero in-graph data movement (models/layers.fold_s2d)
                    if im.ndim == 4 and model.wants_packed_input(*im.shape[1:3]):
                        from yolov5_tpu.models.layers import fold_s2d

                        batch["images"] = np.ascontiguousarray(fold_s2d(im))
                return batch

            # double-buffered: host prep + H2D run 2 batches ahead of the step
            if use_device_cache:
                # whole epoch in ONE dispatch: scan over the index batches
                # (the only per-step host work would be dispatch latency);
                # with multi-scale, one dispatch per stride bucket instead
                from yolov5_tpu.data.device_cache import index_batches

                idx_epoch = np.stack([b["idx"] for b in index_batches(train_loader)])
                if ms_device:
                    agg = None
                    for sz, sel in multiscale_epoch_plan(idx_epoch, ms_sizes,
                                                         ms_rng):
                        state, m = epoch_steps[sz](state, jnp.asarray(sel),
                                                   cache_dev)
                        agg = m if agg is None else jax.tree.map(jnp.add, agg, m)
                else:
                    state, agg = epoch_step(state, jnp.asarray(idx_epoch), cache_dev)
                for _ in range(len(idx_epoch)):
                    callbacks.run("on_train_batch_end")
            else:
                stream = prefetch_to_mesh(
                    iter(train_loader), mesh, depth=2, transform=host_prep,
                    put=getattr(step_fn, "put", None) if step_fn else None)
                for batch in stream:
                    if step_fns is not None:  # per-batch size draw (ms_device)
                        fn = step_fns[int(ms_rng.choice(ms_sizes))]
                        state, metrics = fn(state, batch)
                    else:
                        state, metrics = step_fn(state, batch)
                    # accumulate on device: a float() here would force a full
                    # host sync every step (disastrous over a TPU tunnel)
                    agg = metrics if agg is None else jax.tree.map(jnp.add, agg, metrics)
                    callbacks.run("on_train_batch_end")
            n = nb
            agg = jax.device_get(agg)
            dt = time.time() - t0
            row = {f"train/{k}": float(v) / n for k, v in agg.items()
                   if k in ("box", "obj", "cls", "total")}
            row["train/imgs_per_sec"] = n * batch_size / dt
            callbacks.run("on_train_epoch_end", epoch=epoch)

            # validate the EMA weights (reference validates ema, train.py:446)
            fi = 0.0
            if val_loader is not None:
                ema_vars = {"params": state.ema.params, "batch_stats": state.ema.batch_stats}
                results = evaluate(model, ema_vars, val_loader)
                row.update({f"val/{k}": results[k] for k in ("mp", "mr", "map50", "map")})
                fi = results["fitness"]
            row["fitness"] = fi
            loggers.log_metrics(row, epoch)
            print(f"epoch {epoch + 1}/{epochs}  " +
                  "  ".join(f"{k.split('/')[-1]} {v:.4g}" for k, v in row.items()))

            if fi > best_fitness:
                best_fitness = fi
            if not nosave:
                host_state = jax.device_get(state)
                # last.ckpt keeps the optimizer so --resume restores momentum
                # + schedule position; best.ckpt is the stripped inference
                # artifact (reference strip_optimizer, general.py:770-787)
                save_checkpoint(last, host_state, model, epoch, best_fitness,
                                include_opt=True)
                if val_loader is not None and best_fitness == fi:
                    save_checkpoint(best, host_state, model, epoch, best_fitness)
                if save_period > 0 and epoch % save_period == 0:
                    save_checkpoint(save_dir / f"epoch{epoch}.ckpt",
                                    host_state, model, epoch, best_fitness)
                    # per-period cloud model artifact (reference
                    # loggers on_model_save -> wandb log_model with
                    # latest/epoch-N/best aliases)
                    loggers.log_model(last, epoch=epoch, fitness=fi,
                                      best=best_fitness == fi, opt=opt_dict)
                callbacks.run("on_model_save", epoch=epoch)
            callbacks.run("on_fit_epoch_end", epoch=epoch, fitness=fi)
            if stopper(epoch, fi):
                print(f"early stopping at epoch {epoch + 1} "
                      f"(no fitness gain in {patience} epochs)")
                break

    train_loader.close()
    print(f"done in {(time.time() - t_start) / 3600:.2f}h, best fitness {best_fitness:.4f}")
    if not noplots:
        from yolov5_tpu.utils.plots import plot_labels, plot_results

        plot_results(save_dir / "results.csv")
        plot_labels(train_ds.labels, model.names, save_dir)
    callbacks.run("on_train_end")
    if best.exists():
        loggers.log_model(best, epoch=epoch, fitness=best_fitness, best=True,
                          opt=opt_dict)
    loggers.close()
    return best_fitness, results, save_dir

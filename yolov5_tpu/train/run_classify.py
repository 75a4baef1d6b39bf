"""Classification workload: ImageFolder data, CE train loop, top-1/top-5 val.

Equivalent of /root/reference/classify/train.py and classify/val.py. Reuses
the detection backbone sliced at cutoff=10 + Classify head
(ClassificationModel), the 3-group optimizer and EMA.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from yolov5_tpu.models import ClassificationModel
from yolov5_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from yolov5_tpu.train.optim import build_optimizer, ema_init, ema_update
from yolov5_tpu.utils.general import increment_path, init_seeds
from yolov5_tpu.utils.loggers import Loggers

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ImageFolder:
    """root/{class}/*.jpg dataset with simple train/val transforms
    (reference uses torchvision ImageFolder + classify_transforms,
    utils/augmentations.py:248-341)."""

    def __init__(self, root, img_size=224, augment=False):
        self.root = Path(root)
        self.img_size = img_size
        self.augment = augment
        self.classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.samples = [
            (str(f), ci)
            for ci, c in enumerate(self.classes)
            for f in sorted((self.root / c).iterdir())
            if f.suffix.lower() in {".jpg", ".jpeg", ".png", ".bmp", ".webp"}
        ]
        if not self.samples:
            raise FileNotFoundError(f"no images under {root}")

    def __len__(self):
        return len(self.samples)

    def load(self, i, rng=None):
        import cv2

        path, label = self.samples[i]
        im = cv2.imread(path)
        s = self.img_size
        if self.augment and rng is not None:
            # RandomResizedCrop-ish: random scale crop + horizontal flip
            h, w = im.shape[:2]
            scale = rng.uniform(0.6, 1.0)
            ch, cw = int(h * scale), int(w * scale)
            y0 = int(rng.integers(0, h - ch + 1))
            x0 = int(rng.integers(0, w - cw + 1))
            im = im[y0 : y0 + ch, x0 : x0 + cw]
            if rng.random() < 0.5:
                im = im[:, ::-1]
            im = cv2.resize(im, (s, s), interpolation=cv2.INTER_LINEAR)
        else:
            # CenterCrop(min side) -> resize
            h, w = im.shape[:2]
            m = min(h, w)
            top, left = (h - m) // 2, (w - m) // 2
            im = cv2.resize(im[top : top + m, left : left + m], (s, s),
                            interpolation=cv2.INTER_LINEAR)
        return np.ascontiguousarray(im[..., ::-1]), label  # RGB

    def batches(self, batch_size, shuffle=False, seed=0, epoch=0):
        idx = np.arange(len(self))
        if shuffle:
            idx = np.random.default_rng(seed + epoch).permutation(idx)
        rng = np.random.default_rng(seed * 7919 + epoch)
        for b0 in range(0, len(idx) - batch_size + 1, batch_size):
            sel = idx[b0 : b0 + batch_size]
            ims, labels = zip(*(self.load(int(i), rng) for i in sel))
            yield {"images": np.stack(ims), "labels": np.array(labels, np.int32)}


def normalize(images_uint8, dtype=jnp.float32):
    x = images_uint8.astype(dtype) / 255.0
    return (x - IMAGENET_MEAN.astype(dtype)) / IMAGENET_STD.astype(dtype)


def build_cls_cache(ds):
    """Decode + deterministic center-crop-resize every image ONCE into
    (N, S, S, 3) uint8 + (N,) int32 labels — the classify twin of the
    detect/seg HBM dataset cache (data/device_cache.py). Training then
    ships only index vectors; the random crop/flip runs inside the jitted
    step (data/device_aug.py:classify_device_augment)."""
    n, s = len(ds), ds.img_size
    images = np.zeros((n, s, s, 3), np.uint8)
    labels = np.zeros((n,), np.int32)
    for i in range(n):
        im, lab = ds.load(i)  # center crop, no aug
        images[i] = im
        labels[i] = lab
    return images, labels


def run(data, cfg="yolov5s", epochs=10, batch_size=64, imgsz=224, lr0=0.001,
        optimizer="adam", label_smoothing=0.1, seed=0, project="runs/train-cls",
        name="exp", exist_ok=False, dtype="float32", verbose=True,
        save_dir=None, nosave=False, device_aug=True):
    """Train a classifier; returns (best_top1, save_dir).

    device_aug (default): when the decoded dataset fits the HBM budget, the
    whole train set is cached on device once and each epoch is ONE dispatch —
    a lax.scan over index batches with the random crop/flip inside the jitted
    step (same design as the detect/seg device path). Falls back to the
    host ImageFolder loop otherwise."""
    init_seeds(seed)
    data = Path(data)
    train_dir = data / "train" if (data / "train").exists() else data
    val_dir = data / "val" if (data / "val").exists() else None
    train_ds = ImageFolder(train_dir, imgsz, augment=True)
    val_ds = ImageFolder(val_dir, imgsz) if val_dir else None
    nc = len(train_ds.classes)

    save_dir = Path(save_dir) if save_dir else increment_path(
        Path(project) / name, exist_ok=exist_ok)
    save_dir.mkdir(parents=True, exist_ok=True)
    loggers = Loggers(save_dir)

    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = ClassificationModel(cfg, nc=nc, dtype=jdt)
    nb = max(len(train_ds) // batch_size, 1)
    hyp = {"lr0": lr0, "lrf": 0.01, "momentum": 0.9, "weight_decay": 5e-5,
           "warmup_epochs": 0.0, "warmup_bias_lr": 0.0, "warmup_momentum": 0.9}
    tx = build_optimizer(model.params, hyp, epochs=epochs, steps_per_epoch=nb,
                         batch_size=64, name=optimizer, cos_lr=True)

    params = jax.tree.map(lambda x: np.array(x, copy=True), model.params)
    batch_stats = jax.tree.map(lambda x: np.array(x, copy=True),
                               model.variables.get("batch_stats", {}))
    opt_state = tx.init(params)
    ema = ema_init(params, batch_stats)
    mesh = make_mesh()

    def step_fn(params, batch_stats, opt_state, ema, batch):
        def loss_of(p):
            logits, mutated = model.module.apply(
                {"params": p, "batch_stats": batch_stats},
                normalize(batch["images"], jdt), train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), batch["labels"],
            ).mean()
            if label_smoothing:
                sm = optax.smooth_labels(
                    jax.nn.one_hot(batch["labels"], nc), label_smoothing)
                loss = optax.softmax_cross_entropy(
                    logits.astype(jnp.float32), sm).mean()
            acc = (logits.argmax(-1) == batch["labels"]).mean()
            return loss, (mutated["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        ema2 = ema_update(ema, params2, new_stats)
        return params2, new_stats, opt_state2, ema2, {"loss": loss, "acc": acc}

    step = jax.jit(step_fn, donate_argnums=(0, 1, 2, 3))

    # device-resident fast path: cache fits -> one dispatch per epoch
    use_cache = False
    cache_imgs = cache_labels = None
    if device_aug:
        from yolov5_tpu.data.device_cache import device_memory_budget

        need = len(train_ds) * imgsz * imgsz * 3
        if need <= device_memory_budget():
            imgs_np, labels_np = build_cls_cache(train_ds)
            cache_imgs = jax.device_put(jnp.asarray(imgs_np))
            cache_labels = jax.device_put(jnp.asarray(labels_np))
            use_cache = True
            if verbose:
                print(f"device cache: {len(train_ds)} images "
                      f"({need / 1e6:.0f} MB) resident in HBM")

    if use_cache:
        from yolov5_tpu.data.device_aug import classify_device_augment

        def epoch_body(carry, xs):
            params, batch_stats, opt_state, ema = carry
            idx, key = xs
            ims = classify_device_augment(cache_imgs[idx], key)
            batch = {"images": ims, "labels": cache_labels[idx]}
            p2, bs2, o2, e2, m = step_fn(params, batch_stats, opt_state, ema,
                                         batch)
            return (p2, bs2, o2, e2), m

        @functools.partial(jax.jit, donate_argnums=(0,))
        def epoch_step(carry, idx_epoch, keys):
            carry, ms = jax.lax.scan(epoch_body, carry, (idx_epoch, keys))
            return carry, jax.tree.map(jnp.sum, ms)

    def eval_fn(variables, batch):
        logits = model.module.apply(variables, normalize(batch["images"], jdt),
                                    train=False)
        return logits.astype(jnp.float32)

    eval_jit = jax.jit(eval_fn)

    best_top1, best_snap, best_epoch = 0.0, None, -1
    with mesh:
        for epoch in range(epochs):
            t0 = time.time()
            agg, n = None, 0
            if use_cache:
                rng = np.random.default_rng(seed + epoch)
                idx = rng.permutation(len(train_ds))
                n = len(idx) // batch_size
                idx_epoch = jnp.asarray(
                    idx[: n * batch_size].reshape(n, batch_size).astype(np.int32))
                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(seed), epoch), n)
                (params, batch_stats, opt_state, ema), agg = epoch_step(
                    (params, batch_stats, opt_state, ema), idx_epoch, keys)
            else:
                for batch in train_ds.batches(batch_size, shuffle=True,
                                              seed=seed, epoch=epoch):
                    params, batch_stats, opt_state, ema, m = step(
                        params, batch_stats, opt_state, ema, batch)
                    agg = m if agg is None else jax.tree.map(jnp.add, agg, m)
                    n += 1
            agg = jax.device_get(agg) if agg else {"loss": 0.0, "acc": 0.0}
            row = {"train/loss": float(agg["loss"]) / max(n, 1),
                   "train/acc": float(agg["acc"]) / max(n, 1),
                   "train/imgs_per_sec": n * batch_size / (time.time() - t0)}
            if val_ds:
                top1 = top5 = total = 0
                ema_vars = {"params": ema.params, "batch_stats": ema.batch_stats}
                # decode the val set once, not per epoch
                if not hasattr(val_ds, "_decoded"):
                    val_ds._decoded = list(val_ds.batches(batch_size))
                for batch in val_ds._decoded:
                    logits = np.asarray(eval_jit(ema_vars, {"images": jnp.asarray(batch["images"])}))
                    rank = np.argsort(-logits, axis=-1)
                    top1 += (rank[:, 0] == batch["labels"]).sum()
                    top5 += (rank[:, :5] == batch["labels"][:, None]).any(1).sum()
                    total += len(batch["labels"])
                row["val/top1"] = top1 / max(total, 1)
                row["val/top5"] = top5 / max(total, 1)
                if row["val/top1"] >= best_top1:
                    # snapshot the best-epoch weights for best.ckpt (the
                    # reference keeps last.pt AND best.pt: classify/train.py)
                    best_top1 = row["val/top1"]
                    best_snap = jax.device_get((params, batch_stats, ema))
                    best_epoch = epoch
            loggers.log_metrics(row, epoch)
            if verbose:
                print(f"epoch {epoch + 1}/{epochs}  " +
                      "  ".join(f"{k.split('/')[-1]} {v:.4g}" for k, v in row.items()))
    if not nosave:
        from yolov5_tpu.train.trainer import TrainState
        from yolov5_tpu.utils.checkpoint import save_checkpoint

        state = TrainState(jnp.zeros((), jnp.int32), params, batch_stats, None, ema)
        model.cfg, model.names = cfg, {i: c for i, c in enumerate(train_ds.classes)}
        save_checkpoint(save_dir / "last.ckpt", jax.device_get(state), model,
                        epochs - 1, best_top1, extra={"imgsz": imgsz})
        if best_snap is not None:
            b_params, b_stats, b_ema = best_snap
            b_state = TrainState(jnp.zeros((), jnp.int32), b_params, b_stats,
                                 None, b_ema)
            save_checkpoint(save_dir / "best.ckpt", b_state, model,
                            best_epoch, best_top1, extra={"imgsz": imgsz})
        else:  # no val split: best == last
            import shutil

            shutil.copyfile(save_dir / "last.ckpt", save_dir / "best.ckpt")
            if (save_dir / "last.ckpt.json").exists():
                shutil.copyfile(save_dir / "last.ckpt.json",
                                save_dir / "best.ckpt.json")
    if (save_dir / "last.ckpt").exists():
        loggers.log_model(save_dir / "last.ckpt")
    loggers.close()
    return best_top1, save_dir


def validate_classify(weights, data, imgsz=None, batch_size=64, verbose=True):
    """Standalone classifier validation on an arbitrary checkpoint
    (reference classify/val.py:1-178): top-1/top-5 accuracy + CE loss over
    an ImageFolder, with a per-class accuracy table. Returns a dict
    {"top1", "top5", "loss", "per_class": {name: (n, top1, top5)}}.
    """
    import optax

    from yolov5_tpu.models import ClassificationModel
    from yolov5_tpu.utils.checkpoint import load_checkpoint, variables_from_checkpoint

    payload, meta = load_checkpoint(weights)
    names = {int(k): v for k, v in (meta.get("names") or {}).items()}
    model = ClassificationModel(meta.get("cfg", "yolov5s"),
                                nc=meta.get("nc", len(names) or 1000),
                                cutoff=int(meta.get("cutoff", 10)))
    variables = variables_from_checkpoint(payload)
    if imgsz is None:
        imgsz = int(meta.get("imgsz", 224))

    root = Path(data)
    for sub in ("val", "test", ""):
        cand = root / sub if sub else root
        if cand.is_dir() and any(d.is_dir() for d in cand.iterdir()):
            root = cand
            break
    ds = ImageFolder(root, img_size=imgsz)
    nc = len(ds.classes)

    @jax.jit
    def eval_fn(v, images):
        return model.module.apply(v, normalize(images, model.dtype),
                                  train=False).astype(jnp.float32)

    n = len(ds)
    top1 = np.zeros(nc, np.int64)
    top5 = np.zeros(nc, np.int64)
    count = np.zeros(nc, np.int64)
    loss_sum = 0.0
    for b0 in range(0, n, batch_size):
        sel = list(range(b0, min(b0 + batch_size, n)))
        ims, labels = zip(*(ds.load(i) for i in sel))
        images = np.stack(ims)
        labels = np.array(labels, np.int64)
        if len(sel) < batch_size:  # pad to the compiled shape, mask later
            pad = batch_size - len(sel)
            images = np.concatenate([images, np.zeros((pad, *images.shape[1:]),
                                                      images.dtype)])
        logits = np.asarray(eval_fn(variables, jnp.asarray(images)))[:len(sel)]
        loss_sum += float(optax.softmax_cross_entropy_with_integer_labels(
            jnp.asarray(logits), jnp.asarray(labels)).sum())
        rank = np.argsort(-logits, axis=1)
        for lab, r in zip(labels, rank):
            count[lab] += 1
            top1[lab] += int(r[0] == lab)
            top5[lab] += int((r[:5] == lab).any())

    tot = max(int(count.sum()), 1)
    out = {
        "top1": float(top1.sum() / tot),
        "top5": float(top5.sum() / tot),
        "loss": loss_sum / tot,
        "images": int(count.sum()),
        "per_class": {
            (names.get(c) or ds.classes[c]): (int(count[c]),
                                              float(top1[c] / max(count[c], 1)),
                                              float(top5[c] / max(count[c], 1)))
            for c in range(nc)
        },
    }
    if verbose:
        print(f"{'Class':>20s} {'Images':>7s} {'top1_acc':>9s} {'top5_acc':>9s}")
        print(f"{'all':>20s} {out['images']:7d} {out['top1']:9.3g} "
              f"{out['top5']:9.3g}   loss {out['loss']:.4g}")
        for cname, (cn, t1, t5) in out["per_class"].items():
            print(f"{cname:>20s} {cn:7d} {t1:9.3g} {t5:9.3g}")
    return out

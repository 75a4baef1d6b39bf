"""The jitted train step and training state.

One `jax.jit`-compiled function does everything the reference's hot loop does
(train.py:376-421): forward, loss, backward, optimizer, EMA — with data
parallelism expressed through shardings instead of DDP hooks. Params are
replicated, batches sharded on the 'data' mesh axis; XLA inserts the gradient
all-reduce over ICI automatically.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from yolov5_tpu.parallel.mesh import replicated_spec, shard_batch_spec
from yolov5_tpu.train.optim import EMAState, ema_init, ema_update


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMAState


def scale_hyp(hyp: dict, nl: int, nc: int, imgsz: int) -> dict:
    """Scale loss gains to layer count / class count / image size
    (reference train.py:325-328)."""
    out = dict(hyp)
    out["box"] = hyp.get("box", 0.05) * 3.0 / nl
    out["cls"] = hyp.get("cls", 0.5) * nc / 80.0 * 3.0 / nl
    out["obj"] = hyp.get("obj", 1.0) * (imgsz / 640.0) ** 2 * 3.0 / nl
    return out


def init_train_state(model, tx) -> TrainState:
    # host-side copies: (a) the step donates its input state, which must not
    # invalidate the model's own variables; (b) per-leaf device copies would
    # round-trip a tunneled TPU once per tensor — numpy leaves upload in bulk
    # at the first jitted call instead
    import numpy as np

    copy = lambda t: jax.tree.map(lambda x: np.array(x, copy=True), t)
    params = copy(model.variables["params"])
    batch_stats = copy(model.variables.get("batch_stats", {}))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=ema_init(params, batch_stats),
    )


def _build_step_fn(model, loss_fn, tx, has_masks=False, device_aug_hyp=None,
                   mask_shape=None, overlap=True, ms_size=None):
    """The raw (un-jitted) train-step body shared by make_train_step (one
    dispatch per batch) and make_epoch_step (lax.scan over the epoch).

    ms_size (static int): per-batch multi-scale target size for the
    device-aug path — the on-device mosaic emits its canvas at this
    resolution directly (the resize folds into the mosaic's resample
    einsums, data/device_aug.py mosaic_fused); the non-mosaic path resizes
    after augmentation like the reference (train.py:393-398). One compiled
    program per size; the driver draws the size per batch from the
    stride-aligned bucket set."""

    def step_fn(state: TrainState, batch, cache=None):
        self_idx = None
        if cache is not None:
            self_idx = batch["idx"]
            idx = batch["idx"]
            batch = {"images": cache["images"][idx], "hw": cache["hw"][idx],
                     "targets": cache["targets"][idx],
                     "valid": cache["valid"][idx]}
            if "segments" in cache:
                batch["segments"] = cache["segments"][idx]
        if device_aug_hyp is not None and has_masks:
            from yolov5_tpu.data.device_aug import device_augment_seg

            key = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            batch = device_augment_seg(batch, key, dict(device_aug_hyp),
                                       mask_shape, overlap=overlap,
                                       pool=cache, self_idx=self_idx,
                                       out_size=ms_size)
        elif device_aug_hyp is not None:
            from yolov5_tpu.data.device_aug import (
                device_augment,
                mosaic_device,
                mosaic_in_batch,
            )

            key = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            k_mosaic, k_aug = jax.random.split(key)
            hyp2 = dict(device_aug_hyp)
            if "tiles" in batch or "hw" in batch:
                # on-device mosaic composes + applies the geometry; the
                # generic pass below must not warp a second time
                if "hw" in batch:  # raw batches: mosaic partners from the
                    # whole HBM-resident dataset when cached, else the batch
                    images, targets, valid = mosaic_in_batch(
                        batch["images"], batch["hw"], batch["targets"],
                        batch["valid"], k_mosaic, hyp2,
                        pool=cache, self_idx=self_idx, out_size=ms_size)
                else:  # explicit 4-tile batches
                    images, targets, valid = mosaic_device(
                        batch["tiles"], batch["tile_hw"], batch["targets4"],
                        batch["valid4"], k_mosaic, hyp2, out_size=ms_size)
                batch = {"images": images, "targets": targets, "valid": valid}
                for k in ("degrees", "translate", "scale", "shear", "perspective"):
                    hyp2[k] = 0.0
            batch = device_augment(batch, k_aug, hyp2)
            if ms_size is not None and batch["images"].shape[1] != ms_size:
                # non-mosaic multi-scale: bilinear resize after augmentation
                # (reference train.py:393-398 interpolates the loaded batch)
                im = batch["images"]
                rs = jax.image.resize(
                    im.astype(jnp.float32),
                    (im.shape[0], ms_size, ms_size, im.shape[3]), "linear")
                if im.dtype == jnp.uint8:
                    rs = jnp.clip(rs + 0.5, 0, 255)
                batch = dict(batch, images=rs.astype(im.dtype))
        # normalize on device: uint8 batches cross PCIe/tunnel 4x smaller
        # (reference divides by 255 after H2D too, train.py:379)
        images = batch["images"]
        if images.dtype == jnp.uint8:
            images = images.astype(model.dtype) / 255.0

        def loss_of(params):
            out, mutated = model.module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            if has_masks:
                total, comps = loss_fn(out, batch["targets"], batch["valid"],
                                       batch.get("masks"))
            else:
                total, comps = loss_fn(out, batch["targets"], batch["valid"])
            return total, (comps, mutated["batch_stats"])

        (total, (comps, new_stats)), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA ticks only on real optimizer updates: under MultiSteps the
        # outer gradient_step counter advances once per `accumulate` batches
        gs0 = getattr(state.opt_state, "gradient_step", None)
        gs1 = getattr(opt_state, "gradient_step", None)
        tick = None if gs0 is None else gs1 > gs0
        ema = ema_update(state.ema, params, new_stats, tick=tick)
        new_state = TrainState(state.step + 1, params, new_stats, opt_state, ema)
        metrics = dict(comps, total=total, grad_norm=optax.global_norm(grads))
        return new_state, metrics

    return step_fn


class AutoLayoutStep:
    """Jitted train step that lets XLA pick the image input's device layout.

    The compiled step wants the image batch in its internal (batch-minor)
    layout; fed a default-layout array, XLA prepends a relayout copy
    (~0.6 ms @640 b32 on v5e, measured). AOT-compiling with
    ``Format(Layout.AUTO)`` on ``batch["images"]`` and ``device_put``-ing
    each incoming batch into the chosen format deletes that copy — host
    batches upload straight into the preferred layout. Per-(shape, dtype,
    key-set) compile cache, so per-batch multi-scale keeps working. TPU
    only; other platforms fall back to the plain jitted path.
    """

    def __init__(self, step_fn, state_spec=None, data_spec=None):
        self._fn = step_fn
        self._state_spec = state_spec
        self._data_spec = data_spec
        self._cache = {}
        if state_spec is None:
            self._plain = jax.jit(step_fn, donate_argnums=0)
        else:
            self._plain = jax.jit(step_fn, donate_argnums=0,
                                  in_shardings=(state_spec, data_spec),
                                  out_shardings=(state_spec, state_spec))

    def _compile(self, state, batch):
        from jax.experimental.layout import Format, Layout

        auto = (Format(Layout.AUTO, self._data_spec)
                if self._data_spec is not None else Format(Layout.AUTO))
        batch_sh = {k: (auto if k == "images" else self._data_spec)
                    for k in batch}
        jitted = jax.jit(self._fn, donate_argnums=0,
                         in_shardings=(self._state_spec, batch_sh),
                         out_shardings=((self._state_spec, self._state_spec)
                                        if self._state_spec is not None
                                        else None))
        # Layout.AUTO requires abstract args at lowering time (a concrete
        # jax.Array carries a layout that conflicts with AUTO).
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            (state, batch))
        compiled = jitted.lower(*abstract).compile()
        fmt = compiled.input_formats[0][1]["images"]
        # device_put silently ignores a Layout that pins `tiling` on this
        # backend (axon, jax 0.9): re-request by major_to_minor only — the
        # executable's tiling is the backend default for every shape seen
        # here, so the dims are what matters
        fmt = Format(Layout(fmt.layout.major_to_minor), fmt.sharding)
        return compiled, fmt

    def _key(self, batch):
        imgs = batch["images"]
        return (tuple(imgs.shape), str(imgs.dtype), tuple(sorted(batch)))

    def put(self, batch):
        """Device-put a (host or device) batch with the step's preferred
        image layout — the H2D upload lands directly in the compiled step's
        internal format. Passthrough until the first step at this image
        shape has compiled (the format isn't known yet); the input pipeline
        (prefetch_to_mesh) calls this for every batch."""
        if jax.process_count() > 1:  # multi-host: per-process assembly path
            from yolov5_tpu.parallel.mesh import shard_batch
            return shard_batch(batch, self._data_spec.mesh)
        entry = (self._cache.get(self._key(batch))
                 if "images" in batch else None)
        spec = self._data_spec
        put = {k: (entry[1] if entry is not None and k == "images" else spec)
               for k in batch}
        if entry is None and spec is None:
            return batch
        return {k: jax.device_put(batch[k], put[k]) if put[k] is not None
                else batch[k] for k in batch}

    def __call__(self, state, batch):
        if ("images" not in batch
                or jax.default_backend() not in ("tpu", "axon")):
            return self._plain(state, batch)
        imgs = batch["images"]
        entry = self._cache.get(self._key(batch))
        if entry is None:
            entry = self._cache[self._key(batch)] = self._compile(state, batch)
        compiled, fmt = entry
        if compiled is None:  # relayout refused earlier: plain path
            return self._plain(state, batch)
        cur = getattr(getattr(imgs, "format", None), "layout", None)
        if cur is None or cur.major_to_minor != fmt.layout.major_to_minor:
            imgs = jax.device_put(imgs, fmt)
            if imgs.format.layout.major_to_minor != fmt.layout.major_to_minor:
                # relayout silently refused (tunnel quirk): the AOT call
                # would raise a layout mismatch — use the plain jitted path
                # (XLA inserts the relayout copy itself) for this shape
                import warnings

                warnings.warn("device_put did not apply the step's preferred "
                              "image layout; falling back to the plain jitted "
                              "step for this batch shape")
                self._cache[self._key(batch)] = (None, fmt)
                return self._plain(state, batch)
            batch = dict(batch, images=imgs)
        if self._data_spec is None:
            # AOT executables want committed jax.Arrays, not host numpy
            batch = {k: v if isinstance(v, jax.Array) else jnp.asarray(v)
                     for k, v in batch.items()}
        return compiled(state, batch)


def make_train_step(model, loss_fn, tx, mesh=None, has_masks=False,
                    device_aug_hyp=None, device_cache=False, mask_shape=None,
                    overlap=True, ms_size=None):
    """Build the jitted train step.

    batch: {"images": (B,H,W,3) float, "targets": (B,M,5), "valid": (B,M)}
    (+ "masks" for segmentation). Returns (new_state, metrics).
    device_aug_hyp: when set, HSV/perspective/flip augmentation runs
    on-device inside this step (data/device_aug.py), keyed by state.step.
    device_cache: the step takes a third argument — the device-resident
    dataset (data/device_cache.py) — and batch carries only {"idx": (B,)};
    images/labels are gathered from HBM inside the step.
    mask_shape: (hm, wm) — with has_masks + device_aug_hyp, GT masks are
    rasterized on device from polygon segments at this resolution.
    """
    step_fn = _build_step_fn(model, loss_fn, tx, has_masks=has_masks,
                             device_aug_hyp=device_aug_hyp,
                             mask_shape=mask_shape, overlap=overlap,
                             ms_size=ms_size)

    if mesh is None:
        if device_cache:
            return jax.jit(step_fn, donate_argnums=0)
        return AutoLayoutStep(lambda s, b: step_fn(s, b))

    rep = replicated_spec(mesh)
    data = shard_batch_spec(mesh)
    if device_cache:
        return jax.jit(
            step_fn,
            in_shardings=(rep, data, rep),
            out_shardings=(rep, rep),
            donate_argnums=0,
        )
    return AutoLayoutStep(lambda s, b: step_fn(s, b),
                          state_spec=rep, data_spec=data)


def make_epoch_step(model, loss_fn, tx, mesh, has_masks=False,
                    device_aug_hyp=None, mask_shape=None, overlap=True,
                    ms_size=None):
    """Whole-epoch train step for the device-cached path: lax.scan over the
    epoch's (nb, bs) index batches — ONE dispatch (and one host round trip)
    per EPOCH instead of per batch. On a tunneled or busy-host deployment
    per-step dispatch latency otherwise dominates small models; with the
    dataset resident in HBM nothing about a step depends on the host, so
    the entire epoch is a single XLA program.

    Returns jitted (state, idx_epoch (nb, bs) int32, cache) ->
    (state, metrics summed over the epoch's steps).
    """
    step_fn = _build_step_fn(model, loss_fn, tx, has_masks=has_masks,
                             device_aug_hyp=device_aug_hyp,
                             mask_shape=mask_shape, overlap=overlap,
                             ms_size=ms_size)

    def epoch_fn(state, idx_epoch, cache):
        def body(st, idx):
            st, m = step_fn(st, {"idx": idx}, cache)
            return st, m

        state, ms = jax.lax.scan(body, state, idx_epoch)
        return state, jax.tree.map(lambda x: x.sum(0), ms)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = replicated_spec(mesh)
    idx_sharding = NamedSharding(mesh, P(None, "data"))
    return jax.jit(epoch_fn, in_shardings=(rep, idx_sharding, rep),
                   out_shardings=(rep, rep), donate_argnums=0)

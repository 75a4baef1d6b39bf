import time, numpy as np, jax, jax.numpy as jnp
from yolov5_tpu.models import DetectionModel
from yolov5_tpu.train.loss import ComputeLoss
from yolov5_tpu.train.optim import build_optimizer
from yolov5_tpu.train.trainer import init_train_state, _build_step_fn, scale_hyp
from yolov5_tpu.utils.hyp import load_hyp
from jax.experimental.layout import Layout, Format

batch, imgsz = 32, 640
model = DetectionModel("yolov5s", dtype=jnp.bfloat16)
hyp = scale_hyp(load_hyp("scratch-low"), nl=len(model.stride), nc=model.nc, imgsz=imgsz)
loss_fn = ComputeLoss(model.anchors_per_stride, model.nc, hyp)
tx = build_optimizer(model.params, hyp, epochs=300, steps_per_epoch=128, batch_size=batch)
step_fn = _build_step_fn(model, loss_fn, tx)
rng = np.random.default_rng(0)
from yolov5_tpu.models.layers import pack_s2d
imgs_np = np.ascontiguousarray(pack_s2d(rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)))
images = jnp.asarray(imgs_np, jnp.bfloat16)
m = 32
batch_d = {"images": images,
           "targets": jnp.zeros((batch, m, 5), jnp.float32),
           "valid": jnp.ones((batch, m), bool)}
state = init_train_state(model, tx)

jitted = jax.jit(step_fn, in_shardings=(None, {"images": Format(Layout.AUTO), "targets": None, "valid": None}))
abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), (state, batch_d))
compiled = jitted.lower(*abstract).compile()
fmt = compiled.input_formats[0][1]["images"]
print("preferred:", fmt.layout)

# create an array already in the (full, incl tiling) preferred layout on-device
relayout = jax.jit(lambda x: x, out_shardings=Format(fmt.layout, images.sharding))
img_pref = relayout(images)
print("img_pref layout:", img_pref.format.layout)
batch_pref = dict(batch_d, images=img_pref)

def timeit(fn, state, bd, k_lo=5, k_hi=15):
    s = fn(state, bd)[0]  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k_lo): s, mm = fn(s, bd)
        _ = float(mm["total"]); t_lo = time.perf_counter()-t0
        t0 = time.perf_counter()
        for _ in range(k_hi): s, mm = fn(s, bd)
        _ = float(mm["total"]); t_hi = time.perf_counter()-t0
        ts.append((t_hi-t_lo)/(k_hi-k_lo))
    return float(np.median(ts))

plain = jax.jit(step_fn)
t_plain = timeit(plain, state, batch_d)
print(f"plain step, default-layout input: {t_plain*1000:.2f} ms/step = {batch/t_plain:.1f} img/s")
t_pref = timeit(compiled, state, batch_pref)
print(f"AOT step, preferred-layout input: {t_pref*1000:.2f} ms/step = {batch/t_pref:.1f} img/s")

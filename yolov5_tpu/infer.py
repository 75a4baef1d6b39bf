"""High-level inference: load weights -> jitted forward+decode -> on-device
NMS -> native-space boxes -> annotate/save.

The `Detector` class is the AutoShape/DetectMultiBackend analog
(/root/reference/models/common.py:456-1101) for this framework's checkpoints
and for reference .pt weights; `run()` is the detect.py driver
(/root/reference/detect.py:70-324).
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from yolov5_tpu.data.sources import LoadImages, batched
from yolov5_tpu.models import DetectionModel
from yolov5_tpu.models.weights import fuse_conv_bn
from yolov5_tpu.ops.nms import (detections_to_numpy, non_max_suppression,
                                non_max_suppression_from_maps)
from yolov5_tpu.utils.general import increment_path


def scale_boxes_np(img1_shape, boxes, img0_shape):
    """Numpy un-letterbox (host hot path: eager jnp ops here would each
    round-trip a tunneled TPU). Mirrors ops.boxes.scale_boxes."""
    gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
    pad_x = (img1_shape[1] - img0_shape[1] * gain) / 2
    pad_y = (img1_shape[0] - img0_shape[0] * gain) / 2
    out = boxes.copy()
    out[:, [0, 2]] = (boxes[:, [0, 2]] - pad_x) / gain
    out[:, [1, 3]] = (boxes[:, [1, 3]] - pad_y) / gain
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, img0_shape[1])
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, img0_shape[0])
    return out

# a readable default palette (BGR) for annotation
_PALETTE = [
    (56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255),
    (49, 210, 207), (10, 249, 72), (23, 204, 146), (134, 219, 61),
    (52, 147, 26), (187, 212, 0), (168, 153, 44), (255, 194, 0),
    (147, 69, 52), (255, 115, 100), (236, 24, 0), (255, 56, 132),
    (133, 0, 82), (255, 56, 203), (200, 149, 255), (199, 55, 255),
]


def color_for(cls_id):
    return _PALETTE[int(cls_id) % len(_PALETTE)]


def annotate(im, boxes, scores, classes, names, line_width=None,
             hide_labels=False, hide_conf=False):
    """Draw boxes + labels on a BGR image in place."""
    import cv2

    lw = line_width or max(round(sum(im.shape) / 2 * 0.003), 2)
    for box, score, cls in zip(boxes, scores, classes):
        c = color_for(cls)
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(im, p1, p2, c, lw, cv2.LINE_AA)
        if hide_labels:
            continue
        label = (f"{names.get(int(cls), int(cls))}" if hide_conf else
                 f"{names.get(int(cls), int(cls))} {score:.2f}")
        tf = max(lw - 1, 1)
        w, h = cv2.getTextSize(label, 0, lw / 3, tf)[0]
        outside = p1[1] - h >= 3
        p2t = (p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3)
        cv2.rectangle(im, p1, p2t, c, -1, cv2.LINE_AA)
        cv2.putText(im, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                    0, lw / 3, (255, 255, 255), tf, cv2.LINE_AA)
    return im


class Ensemble:
    """Multi-model inference ensemble (reference models/experimental.py:44-57):
    decoded predictions of all members are concatenated before one NMS."""

    def __init__(self, detectors):
        self.detectors = list(detectors)
        first = self.detectors[0]
        self.names = first.names
        self.nc = first.nc
        self.imgsz = first.imgsz
        self._forward_tta = None
        self.backend = "ensemble"
        self.variables = None

    def _forward(self, _, images):
        preds = [d._forward(d.variables, images) for d in self.detectors]
        return jnp.concatenate(preds, axis=1)

    __call__ = None  # filled below to share Detector.__call__


def ensemble(weights_list, **kw):
    """Build an Ensemble from several weights files (attempt_load with a
    list, reference experimental.py:60-101)."""
    dets = [Detector(w, **kw) for w in weights_list]
    return Ensemble(dets)


class Detector:
    """Weights in, detections out. Accepts our .ckpt or reference .pt."""

    def __init__(self, weights="", cfg="yolov5s", imgsz=640, dtype=jnp.float32,
                 fuse=True, half=False, dnn=False):
        if half:
            dtype = jnp.bfloat16
        names = None
        w = str(weights)
        # exported TF backends (DetectMultiBackend role): the graph already
        # contains decode, so __call__ only adds NMS
        if w.endswith("_saved_model") or w.endswith(".tflite") \
                or w.endswith(".pb"):
            self._init_tf_backend(w, imgsz, dtype)
            return
        if w.endswith(".onnx"):
            self._init_onnx_backend(w, imgsz, dtype, dnn=dnn)
            return
        if w.startswith(("triton+http://", "triton+https://")):
            self._init_remote_backend(w, imgsz, dtype)
            return
        self.backend = "jax"
        if str(weights).endswith(".ckpt"):
            from yolov5_tpu.utils.checkpoint import load_checkpoint, variables_from_checkpoint

            payload, meta = load_checkpoint(weights)
            cfg = meta.get("cfg", cfg)
            # meta anchors win over cfg's: autoanchor may have evolved them
            self.model = DetectionModel(cfg, dtype=dtype,
                                        anchors=meta.get("anchors"))
            self.model.variables = variables_from_checkpoint(payload, prefer_ema=True)
            names = {int(k): v for k, v in meta.get("names", {}).items()} or None
        elif str(weights).endswith(".pt"):
            from yolov5_tpu.models.weights import import_torch_weights, load_torch_state_dict

            self.model = DetectionModel(cfg, dtype=dtype)
            sd = load_torch_state_dict(weights)
            self.model.variables, missed = import_torch_weights(self.model, sd)
            if missed:
                print(f"weight import: {len(missed)} unmatched entries")
        else:
            self.model = DetectionModel(cfg, dtype=dtype)

        self.variables = self.model.variables
        self.fused = False
        if fuse:
            try:
                self.variables = fuse_conv_bn(self.model.variables)
                self.model = DetectionModel(self.model.cfg, dtype=dtype, fused=True)
                self.fused = True
            except Exception as e:  # pragma: no cover
                print(f"fuse failed ({e}); running unfused")
        # pin params to device once: checkpoint loads (and any unfolded
        # fuse_conv_bn leaves) are host numpy, and passing a host leaf to a
        # jitted call re-uploads it on EVERY inference — ~30 MB/call over a
        # tunneled TPU
        self.variables = jax.device_put(self.variables)
        self.names = names or self.model.names
        self.nc = self.model.nc
        self.imgsz = imgsz
        self.dtype = dtype

        model = self.model
        gs = max(model.stride)

        @jax.jit
        def _forward(variables, images):
            x = images.astype(dtype) / 255.0
            maps = model.module.apply(variables, x, train=False)
            return model.decode(maps)

        self._forward = _forward

        # TPU serving fast path (measured on the tunneled v5e, b32@640; see
        # docs/tpu_performance.md "Serving dispatch"):
        #  1. params cross as ONE flat buffer — a per-leaf pytree dispatch
        #     marshals ~300 buffer handles per call (+2.5 ms/call);
        #  2. the jit-boundary interchange is the RAW bf16 head maps
        #     (~137 MB) instead of the decoded fp32 (bs, N, 85) (~274 MB) —
        #     boundary outputs cost far above roofline, so bytes are king;
        #  3. decode runs inside the NMS program on the gathered survivors
        #     only (ops/nms.non_max_suppression_from_maps).
        leaves, treedef = jax.tree.flatten(self.variables)
        shapes = [l.shape for l in leaves]
        dtypes = [l.dtype for l in leaves]
        sizes = [int(np.prod(s)) for s in shapes]
        offs = np.cumsum([0] + sizes)
        # fp32 container: exact for the fp32/bf16 leaves this model carries.
        # ONE jitted dispatch: per-leaf eager ravel/astype would be ~600
        # network round trips on the tunneled device (minutes, not ms).
        self._flat_params = jax.jit(lambda ls: jnp.concatenate(
            [jnp.ravel(l).astype(jnp.float32) for l in ls]))(leaves)

        def _unflatten(flat):
            ls = [jax.lax.dynamic_slice(flat, (int(offs[i]),), (sizes[i],))
                  .reshape(shapes[i]).astype(dtypes[i])
                  for i in range(len(sizes))]
            return jax.tree.unflatten(treedef, ls)

        @jax.jit
        def _forward_maps(flat, images):
            x = images.astype(dtype) / 255.0
            maps = model.module.apply(_unflatten(flat), x, train=False)
            return tuple(maps)

        self._forward_maps = _forward_maps
        self._anchors = tuple(np.asarray(a, np.float32) for a in model.anchors)
        self._strides = tuple(float(s) for s in model.stride)
        #  4. the uint8 batch is phase-packed (layers.fold_s2d) on the HOST
        #     before upload: the in-graph space-to-depth fold of the input
        #     was the single largest item in the serving forward's HLO
        #     (~31% of estimated cycles in pure layout copies at b32@640) —
        #     the same host-pre-pack the train pipeline already does.
        self._wants_packed = bool(model.wants_packed_input(imgsz, imgsz))

        @jax.jit
        def _forward_tta(variables, images):
            """Test-time augmentation: scales (1, .83, .67) x flips
            (none, lr, none), predictions de-scaled back to the input frame
            (reference models/yolo.py:269-312)."""
            h, w = images.shape[1:3]
            x0 = images.astype(dtype) / 255.0
            outs = []
            for ratio, flip in ((1.0, False), (0.83, True), (0.67, False)):
                x = x0
                if flip:
                    x = x[:, :, ::-1, :]
                if ratio != 1.0:
                    nh = -int(-h * ratio // gs) * gs  # ceil to stride multiple
                    nw = -int(-w * ratio // gs) * gs
                    x = jax.image.resize(x, (x.shape[0], int(h * ratio),
                                             int(w * ratio), 3), "bilinear")
                    x = jnp.pad(x, ((0, 0), (0, nh - x.shape[1]),
                                    (0, nw - x.shape[2]), (0, 0)),
                                constant_values=0.447)
                maps = model.module.apply(variables, x, train=False)
                p = model.decode(maps)
                # de-scale with the actual per-axis resize ratio
                rx = (int(w * ratio) / w) if ratio != 1.0 else 1.0
                ry = (int(h * ratio) / h) if ratio != 1.0 else 1.0
                xs = p[..., 0:1] / rx
                ys = p[..., 1:2] / ry
                ws = p[..., 2:3] / rx
                hs = p[..., 3:4] / ry
                if flip:
                    xs = w - xs
                p = jnp.concatenate([xs, ys, ws, hs, p[..., 4:]], axis=-1)
                outs.append(p)
            return jnp.concatenate(outs, axis=1)

        self._forward_tta = _forward_tta

    def _init_tf_backend(self, w, imgsz, dtype):
        """Run an exported SavedModel / TFLite artifact as the forward
        (the reference DetectMultiBackend role, models/common.py:456-814)."""
        import json
        from pathlib import Path

        meta_path = (Path(w) / "yolov5_tpu_meta.json" if w.endswith("_saved_model")
                     else Path(w + ".json"))
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        self.names = {int(k): v for k, v in meta.get("names", {}).items()} or {}
        self.nc = int(meta.get("nc", max(self.names, default=79) + 1))
        self.imgsz = int(meta.get("imgsz", imgsz))
        self.dtype = dtype
        self.model = None
        self.variables = None
        self.fused = True
        self._forward_tta = None

        if w.endswith("_saved_model"):
            import tensorflow as tf

            mod = tf.saved_model.load(w)
            self.backend = "saved_model"

            def fwd(_, images):
                return jnp.asarray(mod.f(tf.constant(np.asarray(images))))
        elif w.endswith(".pb"):
            # frozen GraphDef (reference models/common.py:545-561): import
            # the graph into a wrapped function and prune to its real I/O
            import tensorflow as tf

            from yolov5_tpu.export import gd_outputs

            gd = tf.compat.v1.GraphDef()
            gd.ParseFromString(Path(w).read_bytes())
            wrapped = tf.compat.v1.wrap_function(
                lambda: tf.compat.v1.import_graph_def(gd, name=""), [])
            inputs = [n.name + ":0" for n in gd.node if n.op == "Placeholder"]
            frozen = wrapped.prune(
                tf.nest.map_structure(wrapped.graph.as_graph_element, inputs[0]),
                tf.nest.map_structure(wrapped.graph.as_graph_element,
                                      gd_outputs(gd)))
            self.backend = "pb"

            def fwd(_, images):
                out = frozen(tf.constant(np.asarray(images)))
                return jnp.asarray(out[0] if isinstance(out, (list, tuple))
                                   else out)
        else:
            import tensorflow as tf

            interp = tf.lite.Interpreter(model_path=w)
            interp.allocate_tensors()
            inp = interp.get_input_details()[0]
            outd = interp.get_output_details()[0]
            self.backend = "tflite"
            # int8 exports carry normalized 0-1 boxes (see export.py
            # _build_forward normalize_boxes); rescale like the reference
            # DetectMultiBackend does for TF backends (common.py:707)
            box_scale = float(self.imgsz) if meta.get("normalized") else 1.0

            def fwd(_, images):
                interp.set_tensor(inp["index"], np.asarray(images, np.uint8))
                interp.invoke()
                pred = np.asarray(interp.get_tensor(outd["index"]))
                if box_scale != 1.0:
                    pred = np.concatenate(
                        [pred[..., :4] * box_scale, pred[..., 4:]], -1)
                return jnp.asarray(pred)

        self._forward = fwd

    def _init_onnx_backend(self, w, imgsz, dtype, dnn=False):
        """Run a .onnx artifact through the in-house mini-runtime (no
        onnxruntime in the image; reference models/common.py:519-531 runs
        ONNX via onnxruntime) or, with dnn=True, through OpenCV's DNN module
        — the reference's --dnn backend (models/common.py:515-517). Both are
        CPU-speed parity/portability backends, not the production path."""
        import json
        from pathlib import Path

        from yolov5_tpu.onnx import proto

        buf = Path(w).read_bytes()
        meta = {}
        for k, v in proto.parse_model(buf).metadata.items():
            try:
                meta[k] = json.loads(v)
            except (json.JSONDecodeError, TypeError):
                meta[k] = v
        self.names = {int(k): v for k, v in (meta.get("names") or {}).items()}
        self.nc = int(meta.get("nc", max(self.names, default=79) + 1))
        self.imgsz = int(meta.get("imgsz", imgsz))
        self.dtype = dtype
        self.model = None
        self.variables = None
        self.fused = True
        self._forward_tta = None
        if dnn:
            import cv2

            net = cv2.dnn.readNetFromONNX(w)
            self.backend = "onnx-dnn"

            def fwd(_, images):
                # our export signature: uint8 NHWC in, decoded (bs,N,no) out
                net.setInput(np.asarray(images, np.uint8))
                return jnp.asarray(net.forward())

            self._forward = fwd
        else:
            from yolov5_tpu.onnx.runtime import Runtime

            rt = Runtime(buf)
            self.backend = "onnx"
            self._forward = lambda _, images: jnp.asarray(
                rt(np.asarray(images))[0])

    def _init_remote_backend(self, w, imgsz, dtype):
        """KServe/Triton v2 HTTP remote model as the forward (the reference
        TritonRemoteModel backend, utils/triton.py:11-78). The remote graph
        must emit decoded (bs, N, no) predictions, like our exports do."""
        from yolov5_tpu.remote import KServeV2Client

        client = KServeV2Client(w)
        names = (client.metadata.get("parameters") or {}).get("names")
        self.names = ({int(k): v for k, v in names.items()} if isinstance(names, dict)
                      else {})
        self.nc = int((client.metadata.get("parameters") or {}).get(
            "nc", max(self.names, default=79) + 1))
        self.imgsz = imgsz
        self.dtype = dtype
        self.model = None
        self.variables = None
        self.fused = True
        self.backend = "triton"
        self._forward_tta = None
        self._forward = lambda _, images: jnp.asarray(
            client.infer(np.asarray(images)))

    def _prep_images(self, images_uint8):
        """Host-side prep for the serving fast path: phase-pack a 4D numpy
        batch before upload when the packed stem can consume it in place
        (cheap uint8 reshuffle, overlaps device compute in the pipelined
        detect loop)."""
        if (getattr(self, "_wants_packed", False)
                and isinstance(images_uint8, np.ndarray)
                and images_uint8.ndim == 4):
            from yolov5_tpu.models.layers import fold_s2d

            return jnp.asarray(np.ascontiguousarray(fold_s2d(images_uint8)))
        return jnp.asarray(images_uint8)

    def warmup(self, batch_size=1):
        im = np.zeros((batch_size, self.imgsz, self.imgsz, 3), np.uint8)
        if getattr(self, "_forward_maps", None) is not None:
            jax.block_until_ready(
                self._forward_maps(self._flat_params, self._prep_images(im)))
        else:
            jax.block_until_ready(self._forward(self.variables, jnp.asarray(im)))

    def __call__(self, images_uint8, conf_thres=0.25, iou_thres=0.45,
                 max_det=1000, classes=None, agnostic=False, max_nms=2048,
                 augment=False):
        """images: (bs, s, s, 3) uint8 RGB (letterboxed). Returns Detections."""
        if augment and self._forward_tta is None:
            raise ValueError(f"TTA is not supported on the {self.backend} backend")
        class_filter = None
        if classes is not None:
            class_filter = np.zeros(self.nc, bool)
            class_filter[list(classes)] = True
            class_filter = jnp.asarray(class_filter)
        if not augment and getattr(self, "_forward_maps", None) is not None:
            # serving fast path: raw maps across the boundary, decode fused
            # into NMS (same detections as the decoded path, tested).
            # NOTE a fully-fused single program (forward+decode+NMS in one
            # jit — would also delete the boundary layout copies on the head
            # maps) was tried and REVERTED: with two fused dispatches in
            # flight (the pipelined detect loop), result fetches deadlocked
            # the tunneled runtime. The two-program form is stable under
            # dispatch-ahead pipelining.
            maps = self._forward_maps(self._flat_params,
                                      self._prep_images(images_uint8))
            return non_max_suppression_from_maps(
                maps, self._anchors, self._strides, conf_thres=conf_thres,
                iou_thres=iou_thres, max_det=max_det, agnostic=agnostic,
                class_filter=class_filter, max_nms=max_nms, nc=self.nc,
            )
        fwd = self._forward_tta if augment else self._forward
        preds = fwd(self.variables, jnp.asarray(images_uint8))
        return non_max_suppression(
            preds, conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
            agnostic=agnostic, class_filter=class_filter, max_nms=max_nms,
        )


def save_one_box(box, im0, path, gain=1.02, pad=10):
    """Crop a detection (xyxy) from the original image with margin and save
    (reference utils/plots.py save_one_box: gain 1.02, pad 10px, clipped)."""
    import cv2

    h0, w0 = im0.shape[:2]
    x1, y1, x2, y2 = box
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    bw = (x2 - x1) * gain + 2 * pad
    bh = (y2 - y1) * gain + 2 * pad
    x1 = int(max(cx - bw / 2, 0)); x2 = int(min(cx + bw / 2, w0))
    y1 = int(max(cy - bh / 2, 0)); y2 = int(min(cy + bh / 2, h0))
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), im0[y1:y2, x1:x2])


def run(weights="", source="", cfg="yolov5s", imgsz=640, conf_thres=0.25,
        iou_thres=0.45, max_det=1000, classes=None, agnostic_nms=False,
        save_txt=False, save_conf=False, save_img=True, project="runs/detect",
        name="exp", exist_ok=False, line_thickness=None, batch_size=1,
        half=False, verbose=True, augment=False, data=None, hide_labels=False,
        hide_conf=False, save_crop=False, save_csv=False, vid_stride=1,
        view_img=False, dnn=False):
    """Detect over a source; save annotated images / label txts. Returns
    the list of (path, detections (n,6) native-space) results."""
    import cv2

    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok, mkdir=True)
    (save_dir / "labels").mkdir(exist_ok=True)
    det = Detector(weights, cfg=cfg, imgsz=imgsz, half=half, dnn=dnn)
    if data:  # class names from a dataset yaml (reference --data role)
        import yaml as _yaml

        names = _yaml.safe_load(Path(data).read_text()).get("names")
        if names:
            det.names = {int(k): v for k, v in (names.items()
                         if isinstance(names, dict) else enumerate(names))}
    det.warmup(batch_size)
    s = str(source)
    if s.startswith("screen"):
        from yolov5_tpu.data.sources import LoadScreenshots

        source_iter = LoadScreenshots(s, img_size=imgsz)
    elif s.isnumeric() or s.startswith(("rtsp://", "rtmp://")) or s.endswith(".streams"):
        from yolov5_tpu.data.sources import LoadStreams

        srcs = Path(s).read_text().split() if s.endswith(".streams") else s
        source_iter = LoadStreams(srcs, img_size=imgsz)
    else:
        source_iter = LoadImages(source, img_size=imgsz, vid_stride=vid_stride)
    results = []
    t_total = 0.0
    vid_writers = {}  # source path -> cv2.VideoWriter (reference detect.py:286-310)

    # Three-stage pipeline: a reader thread decodes/letterboxes ahead, the
    # main thread dispatches the (async) device forward+NMS for batch i and
    # only then blocks on batch i-1's device->host fetch — so host decode,
    # device compute, and host postprocess of adjacent batches overlap
    # instead of serializing (the train path's prefetch_to_mesh analog;
    # round-2 measured the serial loop at 2.1x device time).
    import queue as _queue
    import threading as _threading

    q: _queue.Queue = _queue.Queue(maxsize=3)
    _DONE = object()

    def _read():
        try:
            for g in batched(source_iter, batch_size):
                q.put((g, np.stack([x[1] for x in g])))
        finally:
            q.put(_DONE)

    _threading.Thread(target=_read, daemon=True).start()

    def staged():
        pending = None
        while True:
            item = q.get()
            if item is _DONE:
                break
            group, ims = item
            dets = det(ims, conf_thres, iou_thres, max_det, classes,
                       agnostic_nms, augment=augment)  # async dispatch
            if pending is not None:
                pg, pd = pending
                yield pg, detections_to_numpy(pd)  # sync one batch behind
            pending = (group, dets)
        if pending is not None:
            pg, pd = pending
            yield pg, detections_to_numpy(pd)

    csv_rows = []  # (image, prediction, confidence) — reference --save-csv
    t_wall0 = time.perf_counter()
    for group, rows in staged():
        t_total = time.perf_counter() - t_wall0
        for (path, im_lb, im0, meta), r in zip(group, rows):
            if len(r):
                r = np.asarray(r)
                r[:, :4] = scale_boxes_np(im_lb.shape[:2], r[:, :4], im0.shape[:2])
            results.append((path, r))
            if verbose:
                counts = {}
                for c in r[:, 5].astype(int):
                    counts[c] = counts.get(c, 0) + 1
                desc = ", ".join(f"{n} {det.names.get(c, c)}" for c, n in counts.items())
                print(f"{path}: {len(r)} dets  {desc}")
            mode = meta.get("mode", "image")
            stem = Path(path).stem
            # per-frame txt names for videos/streams (reference detect.py:188)
            frame_tag = "" if mode == "image" else f"_{meta.get('frame', 0)}"
            if save_txt and len(r):
                h0, w0 = im0.shape[:2]
                lines = []
                for *xyxy, conf, cls in r:
                    x1, y1, x2, y2 = xyxy
                    row = [int(cls), (x1 + x2) / 2 / w0, (y1 + y2) / 2 / h0,
                           (x2 - x1) / w0, (y2 - y1) / h0]
                    if save_conf:
                        row.append(conf)
                    lines.append(" ".join(f"{v:.6g}" for v in row))
                (save_dir / "labels" / f"{stem}{frame_tag}.txt").write_text(
                    "\n".join(lines) + "\n")
            if save_csv:
                for *xyxy, conf, cls in r:
                    csv_rows.append((Path(path).name,
                                     det.names.get(int(cls), int(cls)),
                                     f"{conf:.2f}"))
            if save_crop:
                for j, (*xyxy, conf, cls) in enumerate(r):
                    cname = str(det.names.get(int(cls), int(cls)))
                    save_one_box(xyxy, im0, save_dir / "crops" / cname /
                                 f"{stem}{frame_tag}_{j}.jpg")
            if save_img or view_img:
                im_out = im0.copy()
                annotate(im_out, r[:, :4], r[:, 4], r[:, 5], det.names,
                         line_thickness, hide_labels=hide_labels,
                         hide_conf=hide_conf)
                if view_img:
                    try:
                        cv2.imshow(str(path), im_out)
                        cv2.waitKey(1)
                    except cv2.error:
                        view_img = False  # headless: warn once, keep going
                        print("--view-img: no display available, disabled")
            if save_img:
                if mode == "image":
                    cv2.imwrite(str(save_dir / Path(path).name), im_out)
                else:
                    # one VideoWriter per source: annotated mp4 out
                    # (reference detect.py:286-310)
                    w = vid_writers.get(path)
                    if w is None:
                        h0, w0 = im_out.shape[:2]
                        safe = stem if mode == "video" else f"stream{meta.get('stream', 0)}"
                        w = cv2.VideoWriter(
                            str(save_dir / f"{safe}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"),
                            float(meta.get("fps") or 30.0), (w0, h0))
                        vid_writers[path] = w
                    w.write(im_out)
    for w in vid_writers.values():
        w.release()
    if save_csv and csv_rows:
        import csv as _csv

        with open(save_dir / "predictions.csv", "w", newline="") as f:
            wcsv = _csv.writer(f)
            wcsv.writerow(["Image Name", "Prediction", "Confidence"])
            wcsv.writerows(csv_rows)
    if verbose:
        n = max(len(results), 1)
        print(f"done: {len(results)} images, {1000 * t_total / n:.1f} ms/img "
              f"(pipelined decode+forward+NMS wall), results in {save_dir}")
    return results, save_dir


# Ensemble shares Detector's NMS/postprocess entry point
Ensemble.__call__ = Detector.__call__

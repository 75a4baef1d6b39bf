"""Self-contained ONNX support: protobuf wire codec (:mod:`.proto`),
jaxpr -> ONNX exporter (:mod:`.convert`), and a mini runtime for running /
verifying the artifacts without onnxruntime (:mod:`.runtime`)."""

from . import proto  # noqa: F401
from .convert import to_onnx, UnsupportedPrimitive  # noqa: F401

"""Reference surface: onnxocr/predict_base.py — the session layer. In the
TPU build a "session" is a jit-compiling GraphExecutor
(onnxocr_tpu/onnx/executor.py); the helper methods keep the reference's
shapes: get_input_name/get_output_name return name lists, get_input_feed
feeds one tensor to every input name (predict_base.py:42-52 semantics)."""
from onnxocr_tpu.onnx.executor import GraphExecutor

__all__ = ["PredictBase"]


class PredictBase:
    def get_onnx_session(self, model_dir, use_gpu=False):
        # use_gpu is accepted for call compatibility; the executor always
        # targets the configured JAX backend (TPU when attached).
        return GraphExecutor(model_dir)

    def get_output_name(self, session):
        return [node.name for node in session.get_outputs()]

    def get_input_name(self, session):
        return [node.name for node in session.get_inputs()]

    def get_input_feed(self, input_name, image_numpy):
        return {name: image_numpy for name in input_name}

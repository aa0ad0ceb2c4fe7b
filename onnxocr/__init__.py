"""Drop-in import compatibility with the reference package layout
(ding113/OnnxOCR `onnxocr/`): code written as
`from onnxocr.onnx_paddleocr import ONNXPaddleOcr` runs unchanged on the
TPU-native engine. Every module here is a thin re-export of onnxocr_tpu."""

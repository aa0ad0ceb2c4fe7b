"""Native NHWC model family and ONNX weight lifting."""

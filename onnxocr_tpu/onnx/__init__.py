"""In-repo ONNX support: protobuf wire parsing, model IR, and a JAX graph
executor that runs inference graphs as single jit-compiled XLA programs."""
from .ir import Model, Graph, Node, load_model, parse_model
from .executor import GraphExecutor

__all__ = ["Model", "Graph", "Node", "load_model", "parse_model",
           "GraphExecutor"]

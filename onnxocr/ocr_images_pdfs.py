"""Reference surface: onnxocr/ocr_images_pdfs.py → OCRLogic, pdf_to_images."""
from onnxocr_tpu.batch.logic import OCRLogic
from onnxocr_tpu.batch.pdf import pdf_to_images

__all__ = ["OCRLogic", "pdf_to_images"]

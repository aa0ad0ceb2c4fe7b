"""Batch orchestration: multi-file/PDF OCR logic."""

"""Batch image/PDF OCR orchestration.

Reference contract: onnxocr/ocr_images_pdfs.py OCRLogic — multi-file runs
with a thread pool, per-file txt outputs under Output_OCR/ beside the input,
optional merged txt, PDF page rasterization, model hot-swap with the
everything-uses-the-v5-dict quirk (:229).

Threading note: all workers share ONE pipeline instance, as in the reference
(:49, :106). That is safe here because each stage's device calls go through
jitted functions (thread-safe dispatch) and per-call state is local; host
pre/post work interleaves under the GIL while device steps overlap.
"""
from __future__ import annotations

import concurrent.futures
import os
import time
from pathlib import Path
from typing import Callable, List, Optional

import numpy as np

from ..pipeline.api import ONNXPaddleOcr, sav2Img
from .. import config as cfg_mod
from . import pdf as pdf_mod


class OCRLogic:
    def __init__(self, status_callback: Callable[[str], None]):
        self.status_callback = status_callback
        self.model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False)

    # ------------------------------------------------------------------ run
    def run(self, files: List[str], save_txt: bool, merge_txt: bool,
            output_img: bool = False, file_time_callback=None,
            pdf_progress_callback=None, max_workers: int = 4):
        import cv2
        start_time = time.time()
        all_text: List[Optional[str]] = [None] * len(files)

        def process_one(idx_file):
            idx, file = idx_file
            ext = os.path.splitext(file)[1].lower()
            self.status_callback(
                f"processing: {os.path.basename(file)} "
                f"({idx + 1}/{len(files)})")
            t0 = time.time()
            text = ""
            if ext == ".pdf":
                images = pdf_mod.pdf_to_images(file, dpi=300)
                text = self._ocr_images(
                    images, file, save_txt, merge_txt, output_img=output_img,
                    is_pdf=True, pdf_progress_callback=pdf_progress_callback,
                    max_workers=max_workers)
            else:
                try:
                    # np.fromfile-free read (CJK-safe paths, reference :79-85)
                    with open(file, "rb") as fimg:
                        arr = np.frombuffer(fimg.read(), np.uint8)
                    img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
                except Exception as e:
                    self.status_callback(f"image read failed: {file}: {e}")
                    if file_time_callback:
                        file_time_callback(idx, 0)
                    return (idx, "")
                if img is None:
                    self.status_callback(f"not a valid image: {file}")
                    if file_time_callback:
                        file_time_callback(idx, 0)
                    return (idx, "")
                text = self._ocr_image(img, file, save_txt,
                                       output_img=output_img)
            t1 = time.time()
            if file_time_callback:
                file_time_callback(idx, t1 - t0)
            self.status_callback(
                f"{os.path.basename(file)} took {t1 - t0:.2f}s")
            return (idx, text)

        with concurrent.futures.ThreadPoolExecutor(
                max_workers=max_workers) as executor:
            futures = [executor.submit(process_one, (i, f))
                       for i, f in enumerate(files)]
            for future in concurrent.futures.as_completed(futures):
                idx, text = future.result()
                all_text[idx] = text

        if save_txt and merge_txt and len(files) > 1:
            out_dir = self._get_output_dir(files[0])
            timestamp = time.strftime("%Y%m%d_%H%M%S")
            out_txt = os.path.join(out_dir, f"merged_ocr_{timestamp}.txt")
            with open(out_txt, "w", encoding="utf-8") as f:
                for text in all_text:
                    if text:
                        f.write(text)
                        f.write("\n\n")
        elapsed = time.time() - start_time
        if files:
            out_dir = self._get_output_dir(files[0])
            self.status_callback(
                f"done in {elapsed:.2f}s, outputs in {out_dir}")
        else:
            self.status_callback(f"done in {elapsed:.2f}s")
        return all_text

    # ---------------------------------------------------------- PDF / pages
    def _ocr_images(self, images, pdf_path, save_txt, merge_txt,
                    output_img=False, is_pdf=False,
                    pdf_progress_callback=None, max_workers: int = 4):
        import cv2
        out_dir = self._get_output_dir(pdf_path)
        pdf_text: List[Optional[str]] = [None] * len(images)
        timestamp = time.strftime("%Y%m%d_%H%M%S")
        total = len(images)

        def process_page(i_img):
            i, img = i_img
            img_cv = cv2.cvtColor(np.asarray(img), cv2.COLOR_RGB2BGR)
            result = self.model.ocr(img_cv)
            if output_img:
                out_img = os.path.join(
                    out_dir, f"{Path(pdf_path).stem}_page{i + 1}_ocr.jpg")
                sav2Img(img_cv, result, name=out_img)
            return (i, self._result_to_text(result))

        with concurrent.futures.ThreadPoolExecutor(
                max_workers=max_workers) as executor:
            futures = [executor.submit(process_page, (i, img))
                       for i, img in enumerate(images)]
            for future in concurrent.futures.as_completed(futures):
                i, page_text = future.result()
                pdf_text[i] = page_text
                if pdf_progress_callback:
                    pdf_progress_callback(i + 1, total)
        if save_txt:
            txt_path = os.path.join(
                out_dir, f"{Path(pdf_path).stem}_ocr_{timestamp}.txt")
            with open(txt_path, "w", encoding="utf-8") as f:
                f.write("\n\n".join(t or "" for t in pdf_text))
        return "\n\n".join(t or "" for t in pdf_text)

    def _ocr_image(self, img, img_path, save_txt, output_img=False):
        out_dir = self._get_output_dir(img_path)
        result = self.model.ocr(img)
        if output_img:
            out_img = os.path.join(out_dir, f"{Path(img_path).stem}_ocr.jpg")
            sav2Img(img, result, name=out_img)
        text = self._result_to_text(result)
        if save_txt:
            timestamp = time.strftime("%Y%m%d_%H%M%S")
            txt_path = os.path.join(
                out_dir, f"{Path(img_path).stem}_ocr_{timestamp}.txt")
            with open(txt_path, "w", encoding="utf-8") as f:
                f.write(text)
        return text

    def _result_to_text(self, result) -> str:
        """Structure → plain text with the reference's empty/odd-shape
        handling (:184-201)."""
        if not result or not isinstance(result, list) or not result[0] or \
                not isinstance(result[0], list):
            return "[未检测到内容]"
        lines = []
        for box in result[0]:
            if isinstance(box, list) and len(box) == 2 and \
                    isinstance(box[1], (list, tuple)) and len(box[1]) >= 1:
                lines.append(str(box[1][0]))
            elif isinstance(box, list) and (
                    isinstance(box[0], (list, tuple)) or
                    isinstance(box[0], float)):
                lines.append("[未识别] " + str(box))
            else:
                lines.append(str(box))
        return "\n".join(lines)

    def _get_output_dir(self, file_path: str) -> str:
        out_dir = os.path.join(os.path.dirname(file_path), "Output_OCR")
        os.makedirs(out_dir, exist_ok=True)
        return out_dir

    # ---------------------------------------------------------- model swap
    def set_model(self, model_name: str, use_gpu: bool = False):
        """Hot-swap the pipeline; every model decodes with the v5 dict
        (reference :212-241 quirk)."""
        model_map = {"PP-OCRv5": "ppocrv5", "PP-OCRv4": "ppocrv4",
                     "ch_ppocr_server_v2.0": "ch_ppocr_server_v2.0"}
        model_dir = model_map.get(model_name, "ppocrv5")
        kwargs = dict(
            use_angle_cls=True,
            use_gpu=use_gpu,
            det_model_dir=cfg_mod.find_asset(f"{model_dir}/det/det.onnx"),
            cls_model_dir=cfg_mod.find_asset(f"{model_dir}/cls/cls.onnx"),
            rec_char_dict_path=cfg_mod.find_asset(
                "ppocrv5/ppocrv5_dict.txt"),
        )
        rec_path = cfg_mod.find_asset(f"{model_dir}/rec/rec.onnx")
        if os.path.exists(rec_path):
            kwargs["rec_model_dir"] = rec_path
        self.model = ONNXPaddleOcr(**kwargs)

"""Final round-1 TPU session: eval accuracy, capture goldens, run the smoke
script, all in one process (the tunnel serializes clients)."""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import warnings
warnings.filterwarnings("ignore")


def main():
    print("=== eval_e2e ===", flush=True)
    from tools import eval_e2e
    sys.argv = ["eval_e2e", "--pages", "4"]
    eval_e2e.main()

    print("=== goldens ===", flush=True)
    from tools import make_goldens
    make_goldens.capture()

    print("=== test_ocr smoke ===", flush=True)
    import time
    import cv2
    from onnxocr_tpu import ONNXPaddleOcr, sav2Img
    img = cv2.imread(
        "/root/reference/onnxocr/test_images/"
        "715873facf064583b44ef28295126fa7.jpg")
    model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False)
    t0 = time.time()
    result = model.ocr(img)
    print(f"total time: {time.time() - t0:.3f}", flush=True)
    print("n results:", len(result[0]), flush=True)
    sav2Img(img, result, name="/tmp/draw_ocr.jpg")
    print("saved /tmp/draw_ocr.jpg", flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()

# TPU OCR service container. The reference deploys py3.7-slim + gunicorn
# (Dockerfile:40); the TPU build has no external server deps — one process
# owns the TPU and serves the stdlib asyncio HTTP app.
FROM python:3.12-slim

WORKDIR /app

# jax[tpu] pulls libtpu on TPU VMs; CPU wheels used elsewhere (tests/CI).
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY onnxocr_tpu ./onnxocr_tpu
COPY onnxocr ./onnxocr
COPY tools ./tools
COPY app-service.py webui.py test_ocr.py ./

RUN g++ -std=c++17 -shared -fPIC -O2 \
    -o onnxocr_tpu/runtime/native/libocrhost.so \
    onnxocr_tpu/runtime/native/geometry.cc -lm

ENV HOST=0.0.0.0 PORT=5005 WARMUP=true
EXPOSE 5005

HEALTHCHECK --interval=30s --timeout=5s --retries=3 \
  CMD python -c "import urllib.request; \
      urllib.request.urlopen('http://localhost:5005/health', timeout=3)"

CMD ["python", "-m", "onnxocr_tpu.service"]

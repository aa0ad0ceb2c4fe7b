"""Single-page browser UI (reference: templates/webui.html — upload files,
pick model/threshold/format, POST to /ocr (v1) or /api/v2/ocr (v2), render
boxes + text, download zip for multi-file text runs)."""
from __future__ import annotations

from typing import Sequence

_PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>TPU OCR</title>
<style>
  body {{ font-family: system-ui, sans-serif; margin: 2rem auto;
         max-width: 860px; color: #222; }}
  h1 {{ font-size: 1.4rem; }}
  fieldset {{ border: 1px solid #ccc; border-radius: 6px;
              margin-bottom: 1rem; }}
  label {{ margin-right: 1rem; }}
  #results {{ white-space: pre-wrap; background: #f7f7f7; padding: 1rem;
              border-radius: 6px; min-height: 4rem; }}
  button {{ padding: .4rem 1.2rem; }}
  table {{ border-collapse: collapse; width: 100%; }}
  td, th {{ border: 1px solid #ddd; padding: .3rem .6rem;
            font-size: .9rem; }}
</style>
</head>
<body>
<h1>TPU OCR service</h1>
<fieldset>
  <legend>Input</legend>
  <input type="file" id="files" multiple accept="image/*">
</fieldset>
<fieldset>
  <legend>Options</legend>
  <label>API:
    <select id="api"><option value="v2">v2</option>
    <option value="v1">v1</option></select></label>
  <label>Model:
    <select id="model">{model_options}</select></label>
  <label>Threshold:
    <input type="number" id="thr" value="0.5" min="0" max="1"
           step="0.05" style="width:4.5rem"></label>
  <label>Format:
    <select id="fmt"><option>json</option><option>text</option>
    <option>tsv</option><option>hocr</option></select></label>
  <button onclick="run()">Run OCR</button>
</fieldset>
<div id="results">results appear here</div>
<script>
async function run() {{
  const files = document.getElementById('files').files;
  const out = document.getElementById('results');
  if (!files.length) {{ out.textContent = 'choose a file first'; return; }}
  out.textContent = 'running...';
  const api = document.getElementById('api').value;
  try {{
    let resp;
    if (api === 'v1') {{
      const buf = await files[0].arrayBuffer();
      const b64 = btoa(String.fromCharCode(...new Uint8Array(buf)));
      resp = await fetch('/ocr', {{
        method: 'POST',
        headers: {{'Content-Type': 'application/json'}},
        body: JSON.stringify({{image: b64}})
      }});
    }} else {{
      const fd = new FormData();
      for (const f of files) fd.append(files.length > 1 ? 'files' : 'file', f);
      fd.append('model_name', document.getElementById('model').value);
      fd.append('conf_threshold', document.getElementById('thr').value);
      fd.append('output_format', document.getElementById('fmt').value);
      resp = await fetch('/api/v2/ocr', {{method: 'POST', body: fd}});
    }}
    const data = await resp.json();
    out.textContent = JSON.stringify(data, null, 2);
    if (data.zip_url) {{
      out.textContent += '\\n\\ndownload: ' + location.origin + data.zip_url;
    }}
  }} catch (e) {{ out.textContent = 'error: ' + e; }}
}}
</script>
</body>
</html>
"""


def render_index(model_names: Sequence[str]) -> str:
    options = "".join(f'<option value="{m}">{m}</option>'
                      for m in model_names)
    return _PAGE.format(model_options=options)

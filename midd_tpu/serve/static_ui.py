"""Single-file web UI — functional equivalent of the reference's React CRA
frontend (frontend/src/: drag-drop upload, POST /denoise, original + four
denoised outputs side by side with preview/download, frontend/src/App.js:11-65,
services/api.js:3-29). Served at GET /ui by the midd_tpu server, no build step.
"""

UI_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8"/>
<title>X-Ray Denoising — TPU</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 0; background: #0f1217; color: #e6e8eb; }
  header { padding: 24px 32px; border-bottom: 1px solid #232832; }
  h1 { margin: 0; font-size: 20px; } h1 span { color: #6cb6ff; }
  p.sub { color: #9aa4b2; margin: 6px 0 0; font-size: 13px; }
  main { padding: 24px 32px; }
  #drop { border: 2px dashed #39414e; border-radius: 12px; padding: 40px;
          text-align: center; cursor: pointer; transition: border-color .2s; }
  #drop.hover { border-color: #6cb6ff; }
  #status { margin: 16px 0; color: #9aa4b2; font-size: 14px; min-height: 20px; }
  .grid { display: grid; grid-template-columns: repeat(auto-fit, minmax(240px, 1fr));
          gap: 16px; margin-top: 16px; }
  .card { background: #161b22; border: 1px solid #232832; border-radius: 10px;
          padding: 12px; }
  .card h3 { margin: 0 0 8px; font-size: 14px; color: #9aa4b2; font-weight: 600; }
  .card img { width: 100%; border-radius: 6px; background: #000; }
  .card a { display: inline-block; margin-top: 8px; font-size: 12px; color: #6cb6ff; }
</style>
</head>
<body>
<header>
  <h1>X-Ray Denoising <span>Hybrid Router · TPU</span></h1>
  <p class="sub">NAFNet fast path · conditional diffusion · expert UNet · learned hybrid fusion</p>
</header>
<main>
  <div id="drop">Drop an X-ray image here or click to choose<input id="file" type="file" accept="image/*" hidden/></div>
  <div id="status"></div>
  <div class="grid" id="results"></div>
</main>
<script>
const drop = document.getElementById('drop');
const fileInput = document.getElementById('file');
const statusEl = document.getElementById('status');
const results = document.getElementById('results');

drop.onclick = () => fileInput.click();
drop.ondragover = e => { e.preventDefault(); drop.classList.add('hover'); };
drop.ondragleave = () => drop.classList.remove('hover');
drop.ondrop = e => { e.preventDefault(); drop.classList.remove('hover');
                     if (e.dataTransfer.files[0]) denoise(e.dataTransfer.files[0]); };
fileInput.onchange = () => { if (fileInput.files[0]) denoise(fileInput.files[0]); };

function card(title, src) {
  return `<div class="card"><h3>${title}</h3><img src="${src}"/>` +
         `<a href="${src}" download="${title.toLowerCase().replace(/ /g,'_')}.png">download</a></div>`;
}

async function denoise(file) {
  statusEl.textContent = 'Denoising with all four models…';
  results.innerHTML = '';
  const orig = URL.createObjectURL(file);
  results.innerHTML = card('Original', orig);
  const form = new FormData();
  form.append('file', file);
  const t0 = performance.now();
  try {
    const resp = await fetch('/denoise', { method: 'POST', body: form });
    if (!resp.ok) throw new Error('HTTP ' + resp.status);
    const data = await resp.json();
    const names = { diffusion: 'Diffusion (8-step)', nafnet: 'NAFNet',
                    expert: 'Expert UNet', hybrid: 'Hybrid Router' };
    for (const k of ['nafnet', 'diffusion', 'expert', 'hybrid']) {
      if (data[k]) results.innerHTML += card(names[k], 'data:image/png;base64,' + data[k]);
      else results.innerHTML += `<div class="card"><h3>${names[k]}</h3><p>failed</p></div>`;
    }
    statusEl.textContent = `Done in ${((performance.now()-t0)/1000).toFixed(2)}s`;
  } catch (err) {
    statusEl.textContent = 'Error: ' + err.message;
  }
}
</script>
</body>
</html>
"""

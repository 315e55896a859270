"""Generate an HTML manual from the meter schema registry.

The reference builds per-plugin HTML documentation at release time from
its TTL port metadata (makedoc.sh:1-40, wrapping the lv2ttl/ tables);
this is the equivalent for the TPU framework: one self-contained page
per meter family plus an index, generated from models/schema.SCHEMAS.

    python tools/gen_docs.py [outdir]      (default docs/html)
"""

from __future__ import annotations

import html
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_CSS = """
body { font-family: sans-serif; margin: 2em auto; max-width: 52em;
       color: #222; }
h1 { border-bottom: 2px solid #888; }
table { border-collapse: collapse; margin: 0.6em 0 1.2em; }
th, td { border: 1px solid #bbb; padding: 0.25em 0.6em; text-align: left; }
th { background: #eee; }
code { background: #f4f4f4; padding: 0 0.2em; }
.nav { margin-bottom: 1.5em; }
"""


def _ctl_rows(controls) -> str:
    rows = []
    for c in controls:
        rng = ""
        if c.lo is not None or c.hi is not None:
            rng = f"{'' if c.lo is None else c.lo} .. " \
                  f"{'' if c.hi is None else c.hi}"
        dflt = "" if c.default is None else str(c.default)
        rows.append(
            f"<tr><td><code>{html.escape(c.name)}</code></td>"
            f"<td>{html.escape(c.unit)}</td><td>{rng}</td>"
            f"<td>{dflt}</td><td>{html.escape(c.doc)}</td></tr>"
        )
    if not rows:
        return "<p><em>none</em></p>"
    return (
        "<table><tr><th>name</th><th>unit</th><th>range</th>"
        "<th>default</th><th>description</th></tr>"
        + "".join(rows) + "</table>"
    )


def _create_names(name: str) -> list[str]:
    """Registry names behind a schema family: needle/K/dr14/... carry
    mono/stereo suffixes, so the documented create() call must use the
    actual creatable name, not the schema family name."""
    from meters_lv2_tpu.models.base import _REGISTRY

    if name in _REGISTRY:
        return [name]
    return [v for v in (name + "mono", name + "stereo") if v in _REGISTRY]


# display analyzers expose init/process (readout per call), not
# init/update/read
_PROCESS_METERS = {"goniometer", "phasewheel", "stereoscope"}


def meter_page(name: str, s) -> str:
    chans = ", ".join(str(c) for c in s.channels)
    create = " or ".join(
        f'<code>meters_lv2_tpu.create("{html.escape(v)}", fs)</code>'
        for v in _create_names(name)
    )
    if name in _PROCESS_METERS:
        life = (
            "Pure-functional pair: <code>state = m.init(batch_shape)</code>"
            " &rarr; <code>readout, state = m.process(state, block)</code>"
            " (display analyzers return their readout every call; there is"
            " no separate <code>read()</code>)."
        )
    else:
        life = (
            "Pure-functional triple:"
            " <code>state = m.init(batch_shape)</code> &rarr;"
            " <code>state = m.update(state, block)</code> &rarr;"
            " <code>readout, state = m.read(state)</code>."
        )
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{html.escape(name)} —
meters_lv2_tpu</title><style>{_CSS}</style></head><body>
<div class="nav"><a href="index.html">&larr; all meters</a></div>
<h1>{html.escape(name)}</h1>
<p>Create with {create}
(channel counts: {chans}).  {life}</p>
<h2>Runtime controls</h2>{_ctl_rows(s.inputs)}
<h2>Readout keys</h2>{_ctl_rows(s.outputs)}
</body></html>
"""


def index_page(schemas) -> str:
    rows = "".join(
        f'<tr><td><a href="{name}.html"><code>{html.escape(name)}</code>'
        f"</a></td><td>{', '.join(str(c) for c in s.channels)}</td>"
        f"<td>{len(s.inputs)}</td><td>{len(s.outputs)}</td></tr>"
        for name, s in sorted(schemas.items())
    )
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>meters_lv2_tpu manual</title>
<style>{_CSS}</style></head><body>
<h1>meters_lv2_tpu — meter manual</h1>
<p>TPU-native batch audio metering. Generated from
<code>models/schema.py</code> (the framework's equivalent of the
reference's TTL port tables) by <code>tools/gen_docs.py</code>.</p>
<table><tr><th>meter</th><th>channels</th><th>controls</th>
<th>readouts</th></tr>{rows}</table>
<h2>Frontends</h2>
<p><b>Batch CLI</b> (offline analysis, the lv2file analog):
<code>python -m meters_lv2_tpu FILES --meters all --render-dir views/
--json</code>.</p>
<p><b>Live shell</b> (the standalone-JACK-app analog):
<code>python -m meters_lv2_tpu.live FILE --meters all --speed 1</code>
serves a dashboard at <code>http://127.0.0.1:8765/</code> with PNG
inline views per meter, EBU transport buttons, runtime control ports
(<code>/ctl?action=set&amp;meter=spectrum&amp;param=speed&amp;value=8</code>),
a JSON readout (<code>/state.json</code>), and session checkpoint /
resume (<code>--state-file</code>, <code>/save</code>,
<code>/load</code>, <code>--resume</code>).</p>
<p>See <code>docs/API.md</code> for per-meter runnable examples.</p>
</body></html>
"""


def generate(outdir: str) -> list[str]:
    from meters_lv2_tpu.models.schema import SCHEMAS

    os.makedirs(outdir, exist_ok=True)
    written = []
    for name, s in SCHEMAS.items():
        p = os.path.join(outdir, f"{name}.html")
        with open(p, "w", encoding="utf-8") as f:
            f.write(meter_page(name, s))
        written.append(p)
    p = os.path.join(outdir, "index.html")
    with open(p, "w", encoding="utf-8") as f:
        f.write(index_page(SCHEMAS))
    written.append(p)
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "docs", "html"
    )
    files = generate(out)
    print(f"wrote {len(files)} pages to {out}")

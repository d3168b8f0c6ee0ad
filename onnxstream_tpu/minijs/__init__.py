"""minijs — an embedded JavaScript (ES2020 subset) engine, from scratch.

Why this exists: the framework ships a dependency-free in-browser
interpreter of the text IR (`api/interp.js`) — the TPU-native counterpart of
the reference's WASM in-tab runtime (reference src/wasm.js +
src/BUILD.bazel:1-134, examples/YOLOv8n_wasm/index.html). The reference can
demonstrate its browser runtime because its CI has a JS host (emrun/node);
this environment has none. minijs closes that gap: a small tree-walking JS
engine, written here from scratch, that parses and executes the REAL
`interp.js` source so its numerical behavior is driven end-to-end against
the Python runtime in CI (tests/test_interp_js_exec.py) — not merely mirrored
by hand-ported twins.

Scope: exactly the language surface interp.js uses (strict-mode ES2020
subset): const/let, functions + closures + arrows, classes with
static/async methods, async/await (synchronous promise semantics — the tab
API is async for symmetry, it never suspends), template literals,
destructuring, spread, for/for-of/while/switch/try, Map/Set, BigInt, and
typed arrays backed by numpy so array semantics (f32 rounding on store,
float64 reads) match the browser exactly.

Non-goals: prototypes chains, getters/setters, generators, regex, eval,
`with`, sloppy mode, the DOM. Anything outside the subset raises
MiniJsError at parse or run time rather than mis-executing.

Entry points:
    from onnxstream_tpu.minijs import Engine
    eng = Engine(); eng.run_file("api/interp.js")
    InterpModel = eng.global_get("InterpModel")
    model = eng.await_(eng.call(eng.get(InterpModel, "create")))
"""

from .errors import MiniJsError, JSThrow
from .engine import Engine

__all__ = ["Engine", "MiniJsError", "JSThrow"]

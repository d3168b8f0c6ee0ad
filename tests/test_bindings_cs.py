"""Structural gate for the C# bindings (api/bindings.cs).

No C# compiler exists in this environment (no dotnet/mono/csc), so the
bindings cannot be compiled in CI — the reference ships its bindings.cs the
same way, alongside a documented build (/root/reference/src/bindings.cs).
This test is the strongest substitute available: a tokenizer-level lint
(strings/comments stripped, every bracket kind balanced, statements
terminated) plus an ABI-surface cross-check that every [DllImport] extern in
bindings.cs names a real OSTPU_EXPORT function in csrc/exports.cpp with the
same arity, and that all 15 exported functions are covered.
"""

import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
CS_PATH = os.path.join(HERE, "..", "onnxstream_tpu", "api", "bindings.cs")
CPP_PATH = os.path.join(HERE, "..", "csrc", "exports.cpp")


def _strip_cs(src: str) -> str:
    """Remove comments, string/char literals (keeping newlines for brackets)."""
    out = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        nxt = src[i + 1] if i + 1 < n else ""
        if c == "/" and nxt == "/":
            j = src.find("\n", i)
            i = n if j < 0 else j
        elif c == "/" and nxt == "*":
            j = src.find("*/", i + 2)
            assert j >= 0, "unterminated /* comment"
            out.append("\n" * src.count("\n", i, j))
            i = j + 2
        elif c == "$" and nxt == '"':  # interpolated string: treat as plain
            i += 1
        elif c == '"':
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                elif src[j] == '"':
                    break
                else:
                    j += 1
            assert j < n, "unterminated string literal"
            out.append('""')
            i = j + 1
        elif c == "'":
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                elif src[j] == "'":
                    break
                else:
                    j += 1
            assert j < n, "unterminated char literal"
            out.append("' '")
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _cs_source() -> str:
    with open(CS_PATH) as f:
        return f.read()


def test_brackets_balanced_and_statements_terminated():
    code = _strip_cs(_cs_source())
    pairs = {")": "(", "]": "[", "}": "{"}
    stack = []
    line = 1
    for ch in code:
        if ch == "\n":
            line += 1
        elif ch in "([{":
            stack.append((ch, line))
        elif ch in ")]}":
            assert stack, f"unmatched '{ch}' at line {line}"
            op, op_line = stack.pop()
            assert op == pairs[ch], (
                f"bracket mismatch: '{op}' (line {op_line}) closed by '{ch}' (line {line})"
            )
    assert not stack, f"unclosed brackets: {stack}"

    # every 'static extern' declaration ends with ');'
    for m in re.finditer(r"static extern[^;{]*", code):
        decl = m.group(0).strip()
        assert decl.endswith(")"), f"extern declaration not ');'-terminated: {decl[:80]}"


def _dllimport_externs(code: str):
    """Return {name: arity} for every [DllImport] static extern declaration."""
    externs = {}
    code = re.sub(r"\[MarshalAs\([^)]*\)\]", "", code)  # drop inline attributes
    for m in re.finditer(
        r"\[DllImport[^\]]*\]\s*public static extern\s+[\w<>\[\].]+\s+(\w+)\s*\(([^)]*)\)",
        code,
    ):
        name, params = m.group(1), m.group(2).strip()
        externs[name] = 0 if not params else params.count(",") + 1
    return externs


def _cpp_exports():
    """Return {name: arity} for every OSTPU_EXPORT function in exports.cpp."""
    with open(CPP_PATH) as f:
        src = f.read()
    exports = {}
    for m in re.finditer(
        r"OSTPU_EXPORT\s+[\w:*]+[*\s]+(\w+)\s*\(([^)]*)\)\s*\{", src, re.S
    ):
        name, params = m.group(1), m.group(2).strip()
        exports[name] = 0 if params in ("", "void") else params.count(",") + 1
    return exports


def test_dllimport_surface_matches_c_abi():
    externs = _dllimport_externs(_strip_cs(_cs_source()))
    exports = _cpp_exports()
    assert len(exports) == 16, f"expected 15 C ABI fns + model_new, got {sorted(exports)}"
    missing = set(exports) - set(externs)
    assert not missing, f"C ABI functions missing from bindings.cs: {sorted(missing)}"
    unknown = set(externs) - set(exports)
    assert not unknown, f"bindings.cs imports non-existent symbols: {sorted(unknown)}"
    for name, arity in externs.items():
        assert arity == exports[name], (
            f"{name}: bindings.cs declares {arity} params, exports.cpp has {exports[name]}"
        )


def test_model_class_wraps_every_entry_point():
    code = _strip_cs(_cs_source())
    # every Native.<fn> referenced in the Model wrapper must be a declared extern
    externs = set(_dllimport_externs(code))
    used = set(re.findall(r"Native\.(\w+)\(", code))
    used -= {"TensorReturn"}
    assert used <= externs, f"Model calls undeclared natives: {sorted(used - externs)}"
    # ... and every extern except the trivial default ctor must be used
    unused = externs - used - {"model_new"}
    assert not unused, f"declared but unused externs: {sorted(unused)}"

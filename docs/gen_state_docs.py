"""Generate docs/states/*.md — one prose spec per registered execution
state (the framework's analog of the reference's ~100 specs/*.md opcode
documents, specs/opcode + specs/error_state).  Each page is derived from
the live registry so it cannot rot:

- responsible opcodes and the implementing gadget (whose docstring carries
  the reference file:line citation);
- a **constraint walkthrough**: the ordered witness-row / lookup /
  constraint operations extracted from the gadget source, with line
  numbers (stack pops, context lookups, transition templates, gas rules);
- the gadget source itself — this framework is an executable spec, so the
  code IS the normative constraint definition, quoted per page like the
  reference's pseudo-code blocks.

Run:  python docs/gen_state_docs.py
"""
import inspect
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zkevm_specs_tpu.evm.execution import EXECUTION_STATE_IMPL  # noqa: E402
from zkevm_specs_tpu.evm.execution_state import (  # noqa: E402
    ExecutionState,
    precompile_execution_states,
)

# operation -> human description, scanned in source order
_WALK_PATTERNS = [
    (r"\bstack_pop\(", "pop a stack word (rw lookup, read)"),
    (r"\bstack_push\(", "push a stack word (rw lookup, write)"),
    (r"\bopcode_lookup\(", "look up the opcode at pc in the bytecode table"),
    (r"\bresponsible_opcode_lookup\(",
     "fixed-table check: this state is responsible for the opcode"),
    (r"\bcall_context_lookup_word\(|\bcall_context_lookup\(",
     "call-context rw lookup"),
    (r"\breversion_info\(", "read RwCounterEndOfReversion + IsPersistent"),
    (r"\baccount_read_word\(|\baccount_read\(", "account rw read"),
    (r"\baccount_write\(", "account rw write (reversible)"),
    (r"\bstate_write\(", "reversible state write (+ mirrored revert row)"),
    (r"\badd_account_to_access_list\(",
     "EIP-2929 access-list warm/cold write (reversible)"),
    (r"\badd_account_storage_to_access_list\(",
     "EIP-2929 storage-slot access-list write (reversible)"),
    (r"\btx_refund_read\(|\btx_refund_write\(", "tx refund rw access"),
    (r"\btx_context_lookup\(|\btx_calldata_lookup\(", "tx-table lookup"),
    (r"\bblock_context_lookup\(", "block-table lookup"),
    (r"\bbytecode_lookup\(|\bbytecode_length\(", "bytecode-table lookup"),
    (r"\bcopy_lookup\(", "copy-table lookup (rw counter delta from event)"),
    (r"\bkeccak_lookup\(", "keccak-table lookup"),
    (r"\bexp_lookup\(", "exp-table lookup"),
    (r"\bsig_lookup\(", "sig-table lookup"),
    (r"\becc_lookup\(", "ecc-table lookup"),
    (r"\bmemory_lookup\(", "memory rw lookup"),
    (r"\btx_log_lookup\(", "tx-log rw lookup"),
    (r"\btx_receipt_read\(|\btx_receipt_write\(", "tx-receipt rw access"),
    (r"\bmemory_expansion_dynamic_length\(|\bmemory_expansion\(",
     "memory expansion: next word size + quadratic gas"),
    (r"\bmemory_copier_gas_cost\(", "per-word copy gas"),
    (r"\btransfer_with_gas_fee\(", "value transfer incl. gas fee "
                                   "(balance rw writes, reversible)"),
    (r"\btransfer\(", "value transfer (balance rw writes, reversible)"),
    (r"\bgenerate_contract_address\(|\bgenerate_CREAT2_contract_address\(",
     "CREATE/CREATE2 address derivation (rlp/keccak hint)"),
    (r"\bconstrain_error_state\(",
     "shared error epilogue: IsSuccess==0, restore caller or go to EndTx"),
    (r"\bstep_state_transition_to_new_context\(",
     "transition: enter the callee/initcode frame"),
    (r"\bstep_state_transition_to_restored_context\(",
     "transition: restore the caller frame (12 context rows)"),
    (r"\bstep_state_transition_in_same_context\(",
     "transition: same frame; opcode gas deducted, pc/sp deltas checked"),
    (r"\bconstrain_step_state_transition\(",
     "transition: explicit per-column step-state constraints"),
    (r"\bconstrain_execution_state_transition\(",
     "state-machine successor check"),
    (r"\bCallGadget\(", "CallGadget: decode the 6/7-word call stack frame"),
    (r"\bPrecompileGadget\(",
     "PrecompileGadget: per-precompile calldata/return-length rules"),
    (r"\bBufferReaderGadget\(", "BufferReaderGadget: bounded buffer read"),
    (r"\bmul_add_words_512\(", "512-bit mul-add decomposition"),
    (r"\bmul_add_words\(", "256-bit mul-add decomposition (a*b + c == d)"),
    (r"\badd_words\(", "multi-addend word addition with carry"),
    (r"\bcompare_word\(", "256-bit comparison gadget"),
    (r"\bconstant_divmod\(", "witnessed quotient/remainder with range check"),
]


def _walkthrough(fn):
    try:
        src, start = inspect.getsourcelines(fn)
    except OSError:
        return [], ""
    steps = []
    for off, line in enumerate(src):
        stripped = line.strip()
        if stripped.startswith("#"):
            continue
        for pat, desc in _WALK_PATTERNS:
            if re.search(pat, line):
                steps.append((start + off, stripped, desc))
                break
    return steps, "".join(src)


def main():
    out_dir = Path(__file__).parent / "states"
    out_dir.mkdir(exist_ok=True)
    precompiles = set(precompile_execution_states())
    index = ["# Execution-state specs",
             "",
             "One page per registered execution state (83 total), generated",
             "from the live gadget registry by `docs/gen_state_docs.py`.",
             "Each page carries the constraint walkthrough extracted from",
             "the gadget source plus the source itself (the executable",
             "spec), mirroring the reference's specs/opcode + error_state",
             "markdown documents.",
             "", "| state | kind | gadget | responsible opcodes |",
             "|---|---|---|---|"]
    for state, fn in sorted(EXECUTION_STATE_IMPL.items(),
                            key=lambda kv: int(kv[0])):
        mod = inspect.getmodule(fn)
        mod_path = (mod.__name__.replace("zkevm_specs_tpu.",
                                         "zkevm_specs_tpu/")
                    .replace(".", "/") + ".py")
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
                else "precompile" if state in precompiles
                else "opcode")
        gadget_doc = inspect.getdoc(fn) or ""
        mod_doc = inspect.getdoc(mod) or ""
        steps, source = _walkthrough(fn)

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
        if steps:
            body += ["", "## Constraint walkthrough", "",
                     "Witness rows, lookups and transition templates in the",
                     "order the gadget emits them (line numbers into",
                     f"`{mod_path}`; conditional branches are lane-masked at",
                     "runtime):", ""]
            for line_no, text, desc in steps:
                code = text if len(text) <= 78 else text[:75] + "..."
                body.append(f"- L{line_no} — {desc}")
                body.append(f"  `{code}`")
        if source:
            body += ["", "## Gadget source (normative)", "",
                     "```python", source.rstrip(), "```"]
        body.append("")
        body.append("Conformance: per-gadget vectors in `tests/evm/`; "
                    "block-level coverage through the tracer in "
                    "`tests/test_block_*.py` (the mega block touches all 83 "
                    "registered states, tests/test_block_conformance.py).")
        (out_dir / f"{state.name}.md").write_text("\n".join(body) + "\n")
        index.append(f"| [{state.name}]({state.name}.md) | {kind} | "
                     f"`{fn.__name__}` | {len(op_names)} |")
    (out_dir / "README.md").write_text("\n".join(index) + "\n")
    print(f"wrote {len(EXECUTION_STATE_IMPL)} state pages to {out_dir}")


if __name__ == "__main__":
    main()

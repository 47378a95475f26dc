"""Regenerate the frozen loghub rule-spec snapshots.

Loads each of the reference's 16 ``example/loghub_<X>/parser.py`` scripts
through the compat shim (``log2seq_ray.compat.load_parser_script``) and
serializes the resulting ENGINE specs to
``log2seq_ray/rules/loghub_specs/<X>.json`` — the offline fallback
``rules/loghub.py`` uses when the reference tree is absent.

    python tools/freeze_loghub.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF_EXAMPLE = Path("/root/reference/example")


def main() -> None:
    from log2seq_ray.compat import load_parser_script
    from log2seq_ray.rules import serde
    from log2seq_ray.rules.loghub import DATASETS

    out_dir = (Path(__file__).resolve().parent.parent / "log2seq_ray"
               / "rules" / "loghub_specs")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in DATASETS:
        script = REF_EXAMPLE / f"loghub_{name}" / "parser.py"
        rules, actions, _ = load_parser_script(str(script))
        (out_dir / f"{name}.json").write_text(
            serde.spec_to_json(rules, actions))
        print(f"froze {name}: {len(rules)} rules, {len(actions)} actions")


if __name__ == "__main__":
    main()

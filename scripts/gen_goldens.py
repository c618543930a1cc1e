"""Regenerate committed golden fixtures (tests/fixtures/).

Run only when STRIPPER_SPEC_VERSION / the generator / normalization rules
change intentionally: python scripts/gen_goldens.py
"""
import json
import pathlib

from pie_ray.sources.synth import gen_page
from pie_ray.stages.extract import html_to_text
from pie_ray.util import sha256_hex

FIX = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"
FIX.mkdir(parents=True, exist_ok=True)

N = 200
golden = {}
for i in range(N):
    rec, _ = gen_page(i)
    golden[rec["url"]] = sha256_hex(html_to_text(rec["html"]))
(FIX / "golden_text.json").write_text(json.dumps(golden, indent=0, sort_keys=True))
print(f"wrote {len(golden)} golden text hashes")

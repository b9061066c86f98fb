#!/usr/bin/env python3
"""Dev-only driver-side tool (NOT part of the shipped library).

Measures the reference processor (Pennsieve/processor-EDF, the
single-node pure-Python task loop at /root/reference) as a wall-clock
baseline for the same end-to-end contract EdfPipeline.process serves:
EDF file -> per-channel binary dumps + channel JSON manifests.

The reference's requirements.txt pins `quantities`, which is not
installed in this zero-egress container; it is only referenced in an
isinstance() check (utils.convert_to_long), so a one-class stub is
injected. /root/reference is never modified.

Usage: python3 tools/baseline_reference.py <out.json> <file.edf> [more...]
Emits one JSON record per file: wall seconds, bytes, MB/s, and the
number of output bytes the run produced (a zero-output run means the
task swallowed an exception -- the reference catches and prints).
"""
import json
import os
import sys
import tempfile
import time
import types

# stub the uninstalled isinstance-only dependency
qmod = types.ModuleType('quantities')
class _Quantity:
    pass
qmod.Quantity = _Quantity
sys.modules['quantities'] = qmod

sys.path.insert(0, '/root/reference/processor')


def run_once(edf_path):
    out_dir = tempfile.mkdtemp(prefix='ref_baseline_')
    os.environ['OUTPUT_DIR'] = out_dir
    os.environ.pop('INPUT_FILE', None)
    from edf_processor import EdfProcessor
    t0 = time.time()
    task = EdfProcessor(inputs={'file': edf_path})
    task.run()
    dt = time.time() - t0
    out_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(out_dir) for f in fs)
    size = os.path.getsize(edf_path)
    rec = {
        'engine': 'reference (Pennsieve/processor-EDF, single-node python)',
        'file': edf_path,
        'input_bytes': size,
        'output_bytes': out_bytes,
        'sec': round(dt, 3),
        'mb_per_s': round(size / dt / 1e6, 3),
    }
    if out_bytes == 0:
        rec['warning'] = 'no output written -- task may have swallowed an exception'
    return rec


def main():
    if len(sys.argv) < 3:
        sys.exit('usage: baseline_reference.py <out.json> <file.edf> [more...]')
    out_path, files = sys.argv[1], sys.argv[2:]
    records = []
    for f in files:
        rec = run_once(f)
        print(json.dumps(rec))
        records.append(rec)
    existing = []
    if os.path.exists(out_path):
        with open(out_path) as fh:
            existing = json.load(fh)
    with open(out_path, 'w') as fh:
        json.dump(existing + records, fh, indent=1)


if __name__ == '__main__':
    main()

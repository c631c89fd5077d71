# Run the oracle gate in the warm REPL:
#   exec(open('scripts/run_gate.py').read())
# Optionally set GATE_ONLY = ['name', ...] and GATE_SF before exec.
import sys

for _n in [n for n in sys.modules if n.startswith('pandas_plus_spark') or n == '__spark_entry__']:
    del sys.modules[_n]
sys.path.insert(0, '/root/repo') if '/root/repo' not in sys.path else None
sys.path.insert(0, '/root/repo/tests') if '/root/repo/tests' not in sys.path else None
if 'oracle_harness' in sys.modules:
    del sys.modules['oracle_harness']
import oracle_harness

_sf = globals().get('GATE_SF', '/root/testdata/sf0.01')
_only = globals().get('GATE_ONLY', None)
_res = oracle_harness.run_gate(spark, _sf, only=_only)
_n_ok = sum(1 for v in _res.values() if v.startswith('OK'))
for k, v in _res.items():
    print(f"{'PASS' if v.startswith('OK') else 'FAIL':4s} {k:28s} {v if not v.startswith('OK') else v}")
print(f"GATE {_n_ok}/{len(_res)} OK")

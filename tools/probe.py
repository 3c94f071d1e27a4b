"""One entry point for the measurement probes behind PERF.md / RUNS.md.

The probes accumulated as one-off scripts across rounds 2-4 (each backs a
recorded number); this dispatcher keeps them runnable under a single
surface (VERDICT r4 task 10) without changing their recorded outputs:

  python tools/probe.py <name> [args...]      # e.g. probe.py stab768
  python tools/probe.py --list

Probe scripts live in tools/probes/ and still accept their original
argv/env knobs (CFGS=..., PREC=..., SHARED_CORR=..., etc.).
"""
import os
import runpy
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBES = os.path.join(ROOT, "tools", "probes")


def available():
    return sorted(f[:-3] for f in os.listdir(PROBES)
                  if f.endswith(".py") and not f.startswith("_"))


def main() -> None:
    names = available()
    if len(sys.argv) < 2 or sys.argv[1] in ("--list", "-l", "--help", "-h"):
        doc = {}
        for n in names:
            with open(os.path.join(PROBES, n + ".py")) as f:
                head = f.read(400)
            first = head.split('"""')[1].splitlines()[0] if '"""' in head \
                else ""
            doc[n] = first
        print("usage: python tools/probe.py <name> [args...]\n\nprobes:")
        for n in names:
            print(f"  {n:16s} {doc[n]}")
        return
    name = sys.argv[1]
    if name not in names:
        raise SystemExit(f"unknown probe {name!r}; one of {', '.join(names)}")
    sys.path.insert(0, ROOT)
    os.chdir(ROOT)                       # probes assume repo-root cwd
    sys.argv = [name + ".py"] + sys.argv[2:]
    runpy.run_path(os.path.join(PROBES, name + ".py"), run_name="__main__")


if __name__ == "__main__":
    main()

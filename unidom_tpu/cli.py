"""``unidom`` console entry point (the reference ships a ``daxbench``
console script, DaXBench/setup.py:84-87).

Subcommands:
    unidom train  ...      APG training (see algorithms/apg.py flags)
    unidom para   ...      parameter-aware APG (algorithms/apg_para.py)
    unidom solve  ...      trajectory / RL solvers (algorithms/solve.py)
    unidom bench           run the benchmark and print the JSON line
    unidom envs            list registered environments
    unidom goals [...]     regenerate goal assets
"""

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]

    if cmd == "train":
        from unidom_tpu.algorithms.apg import main as train_main

        train_main(rest)
    elif cmd == "para":
        from unidom_tpu.algorithms.apg_para import main as para_main

        para_main(rest)
    elif cmd == "solve":
        from unidom_tpu.algorithms.solve import main as solve_main

        solve_main(rest)
    elif cmd == "bench":
        import runpy
        import os

        sys.argv = ["bench.py"]
        bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "bench.py")
        if os.path.exists(bench):
            runpy.run_path(bench, run_name="__main__")
        else:
            print("bench.py not found", file=sys.stderr)
            return 1
    elif cmd == "envs":
        from unidom_tpu.envs.registration import env_functions

        for name, ctor in sorted(env_functions.items()):
            print(f"{name:24s} {ctor.__name__}")
    elif cmd == "goals":
        import runpy
        import os

        script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              "scripts", "make_goals.py")
        sys.argv = ["make_goals.py"] + rest
        runpy.run_path(script, run_name="__main__")
    else:
        print(f"unknown subcommand {cmd!r}\n{__doc__}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())

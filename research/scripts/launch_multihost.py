"""Multi-host TPU launcher.

The reference's only multi-node story is SLURM arrays of independent
processes (SURVEY §2.4); on TPU pods the equivalent is one process per host
joined through jax.distributed.  This launcher initializes the distributed
runtime from standard TPU env vars (or explicit flags) and then executes a
training module — the mesh in parallel/mesh.py then spans all hosts'
devices automatically.

    python -m research.scripts.launch_multihost \
        --coordinator 10.0.0.2:8476 --num-processes 4 --process-id 0 \
        -- research.dmri_hippo.run main <dataset> <logs>
"""
import argparse
import runpy
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (auto-detected on Cloud TPU)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("module_and_args", nargs=argparse.REMAINDER,
                        help="-- <module> <args...>")
    args = parser.parse_args()

    import jax

    kwargs = {}
    if args.coordinator:
        kwargs = dict(coordinator_address=args.coordinator,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
    jax.distributed.initialize(**kwargs)
    print(f"process {jax.process_index()}/{jax.process_count()}: "
          f"{jax.local_device_count()} local / {jax.device_count()} global devices")

    rest = [a for a in args.module_and_args if a != "--"]
    if not rest:
        raise SystemExit("no target module given")
    module, module_args = rest[0], rest[1:]
    sys.argv = [module] + module_args
    runpy.run_module(module, run_name="__main__")


if __name__ == "__main__":
    main()

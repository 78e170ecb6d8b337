"""Run a TPU script with every exception caught, so the process never dies
with an initialized axon backend (which wedges the remote worker ~20-40 min
— see CLAUDE.md). Usage: python scripts/_safe_run.py <script> [args...]"""

import runpy
import sys
import traceback


def main():
    script = sys.argv[1]
    sys.argv = sys.argv[1:]
    try:
        runpy.run_path(script, run_name="__main__")
        print("SAFE_RUN_OK", flush=True)
    except SystemExit as e:
        # scripts ending in sys.exit(main()) raise SystemExit(None/0) on
        # success — only a truthy code is a failure
        if e.code:
            print("SAFE_RUN_FAILED", flush=True)
        else:
            print("SAFE_RUN_OK", flush=True)
    except BaseException:
        traceback.print_exc()
        print("SAFE_RUN_FAILED", flush=True)


if __name__ == "__main__":
    main()

"""Root conftest: keep `pytest` runnable without pytest-xdist.

pyproject.toml sets addopts = "-n 4" (the suite is XLA-compile-bound and
needs the workers to stay under the time budget). In an environment without
pytest-xdist that would make a bare `pytest` die with "unrecognized
arguments: -n", so strip the flag here before argument parsing when the
plugin is absent (ADVICE r2: pyproject.toml:27).
"""


def pytest_load_initial_conftests(early_config, parser, args):
    try:
        import xdist  # noqa: F401
        return
    except ImportError:
        pass
    i = 0
    while i < len(args):
        a = args[i]
        if a == "-n" or a == "--numprocesses":
            del args[i:i + 2]
        elif a.startswith(("-n", "--numprocesses=")) and a not in ("-n",):
            del args[i]
        else:
            i += 1

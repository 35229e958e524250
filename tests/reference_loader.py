"""Import the *actual* reference TIM model code in-process.

``tests/test_windows_golden.py`` pioneered executing reference modules
read-only from /root/reference with their logging util stubbed; this
helper generalizes it so the flagship models themselves
(``recognition/time_interval_machine/models/tim.py`` and
``detection/time_interval_machine/models/tim.py`` plus their ``helpers/``)
can serve as parity oracles instead of a hand transcription.

Both variants ship a package named ``time_interval_machine``; the context
manager sandboxes ``sys.modules`` so each import sees only its own tree
and leaves the interpreter clean afterwards.
"""

import contextlib
import importlib
import logging as _pylogging
import os
import sys
import types

_REF = "/root/reference"


@contextlib.contextmanager
def reference_tim_module(variant: str):
    """Yield the executed reference ``models/tim.py`` module for
    ``variant`` in {"recognition", "detection"}."""
    ref_root = os.path.join(_REF, variant)
    assert os.path.isdir(ref_root), ref_root

    saved = {k: v for k, v in sys.modules.items()
             if k.split(".")[0] == "time_interval_machine"}
    for k in saved:
        del sys.modules[k]

    pkg = types.ModuleType("time_interval_machine")
    pkg.__path__ = [os.path.join(ref_root, "time_interval_machine")]
    utils_pkg = types.ModuleType("time_interval_machine.utils")
    utils_pkg.__path__ = [
        os.path.join(ref_root, "time_interval_machine/utils")]
    log_stub = types.ModuleType("time_interval_machine.utils.logging")
    log_stub.get_logger = lambda name: _pylogging.getLogger(name)
    sys.modules.update({
        "time_interval_machine": pkg,
        "time_interval_machine.utils": utils_pkg,
        "time_interval_machine.utils.logging": log_stub,
    })
    try:
        yield importlib.import_module("time_interval_machine.models.tim")
    finally:
        for k in list(sys.modules):
            if k.split(".")[0] == "time_interval_machine":
                del sys.modules[k]
        sys.modules.update(saved)

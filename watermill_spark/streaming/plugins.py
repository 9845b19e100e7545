"""Router plugins (`message/router/plugin/signals.go:13-27`)."""

from __future__ import annotations

import signal
import threading

from .router import Router


def signals_handler(router: Router, signals: tuple[int, ...] = (signal.SIGINT, signal.SIGTERM)):
    """Close the router gracefully on SIGINT/SIGTERM
    (`message/router/plugin/signals.go:13-27`).

    Registers handlers that call `router.close()` — which stops every active
    streaming query after its in-flight micro-batch commits, the analog of
    the reference draining handlers before close. Returns a restore()
    callable reinstating the previous handlers (the reference's plugin is
    process-global too, but tests want cleanup).

    Only callable from the main thread (CPython restriction); a no-op with a
    warning otherwise, matching the reference's best-effort behavior.
    """
    if threading.current_thread() is not threading.main_thread():
        import warnings

        warnings.warn("signals_handler: not on main thread; skipping", stacklevel=2)
        return lambda: None

    previous = {}

    def on_signal(signum, frame):  # noqa: ARG001
        router.close()

    for s in signals:
        previous[s] = signal.getsignal(s)
        signal.signal(s, on_signal)

    def restore():
        for s, h in previous.items():
            signal.signal(s, h)

    return restore

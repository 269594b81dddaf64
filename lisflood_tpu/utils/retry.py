"""Robust input access for flaky network filesystems.

TPU-native analogue of the reference's iterative open helpers
(zusatz.py:407-451 iterOpenNetcdf/iterReadPCRasterMap/remoteInputAccess):
an open/read that fails with an OS-level error is retried up to
MAX_READ_TRIALS times with READ_PAUSE seconds between attempts; a missing
file under a reachable root fails fast as a LisfloodFileError.
"""
from __future__ import annotations

import os
import time

from .errors import LisfloodFileError

MAX_READ_TRIALS = int(os.environ.get("LISFLOOD_MAX_READ_TRIALS", "100"))
READ_PAUSE = float(os.environ.get("LISFLOOD_READ_PAUSE", "0.1"))


def remote_input_access(function, file_path, error_msg=""):
    """Call `function(file_path)`, retrying transient I/O errors.

    Fail-fast rule (reference zusatz.py:441-443): if the filesystem root
    is reachable but the file does not exist, this is a configuration
    error, not a network outage — raise immediately."""
    file_path = str(file_path)
    root = os.path.sep.join(file_path.split(os.path.sep)[:4])
    num_trials = 1
    while True:
        try:
            obj = function(file_path)
            if num_trials > 1:
                print(f"File {file_path} successfully accessed after {num_trials} attempts")
            return obj
        except (IOError, OSError):
            if os.path.exists(root) and not os.path.exists(file_path):
                raise LisfloodFileError(file_path, error_msg)
            if num_trials >= MAX_READ_TRIALS:
                raise IOError(
                    f"Cannot access file {file_path}!\n"
                    f"Network down for too long OR bad root directory {root}!")
            num_trials += 1
            print(f"Trying to access file {file_path}: attempt n. {num_trials}")
            time.sleep(READ_PAUSE)

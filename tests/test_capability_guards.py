"""Optional-dependency guards (VERDICT r4 item 7): features that need
cv2/PIL must fail with an actionable message naming the fix, not a bare
ImportError mid-run, when the dependency is absent.  Absence is simulated
with a meta_path import blocker in a clean subprocess."""

import subprocess
import sys

BLOCKER = """
import sys

_BLOCKED = __NAMES__

class _Block:
    def find_spec(self, name, path=None, target=None):
        if name.split('.')[0] in _BLOCKED:
            raise ImportError("blocked for test: " + name)
        return None

sys.meta_path.insert(0, _Block())
for m in list(sys.modules):
    if m.split('.')[0] in _BLOCKED:
        del sys.modules[m]
"""


def _run(code: str, blocked: set) -> subprocess.CompletedProcess:
    src = BLOCKER.replace("__NAMES__", repr(blocked)) + code
    return subprocess.run([sys.executable, "-c", src], capture_output=True,
                          text=True, timeout=300)


def test_mjpeg_decode_without_cv2_or_pil_is_actionable():
    p = _run("""
from gstreamer_vit_tracker_tpu.media.mjpeg import decode_jpeg
try:
    decode_jpeg(b'\\xff\\xd8 not a real jpeg \\xff\\xd9')
except RuntimeError as e:
    msg = str(e)
    assert 'cv2 or PIL' in msg and '--source' in msg, msg
    print('GUARD_OK')
""", {"cv2", "PIL"})
    assert "GUARD_OK" in p.stdout, p.stdout + p.stderr


def test_eval_tracker_cv2_without_cv2_is_actionable():
    p = _run("""
import runpy, sys
sys.argv = ['eval_tracking.py', '--tracker', 'cv2', '--preset',
            'vittrack-t', '--frames', '2', '--cpu']
try:
    runpy.run_path('scripts/eval_tracking.py', run_name='__main__')
except SystemExit as e:
    assert e.code == 2, e.code
print('GUARD_OK')
""", {"cv2"})
    assert "GUARD_OK" in p.stdout, p.stdout + p.stderr
    assert "--tracker matched" in p.stderr, p.stderr

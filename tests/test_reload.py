"""Live kernel reload mechanics (the shader hot-recompile analog)."""

import os
import sys
import textwrap
import time

from tinyrenderer_tpu.render.reload import KernelReloader


def _write_module(path, value):
    path.write_text(textwrap.dedent(f"""
        VALUE = {value}
        """))


def test_reload_picks_up_changes(tmp_path):
    mod_path = tmp_path / "fake_kernel_mod.py"
    _write_module(mod_path, 1)
    sys.path.insert(0, str(tmp_path))
    try:
        import fake_kernel_mod  # noqa: F401
        reloader = KernelReloader(modules=("fake_kernel_mod",))

        res = reloader.reload_if_changed()
        assert res.ok and not res.changed  # untouched -> no-op

        time.sleep(0.01)
        _write_module(mod_path, 2)
        os.utime(mod_path, (time.time() + 1, time.time() + 1))
        res = reloader.reload_if_changed()
        assert res.ok and res.reloaded == ["fake_kernel_mod"]
        assert sys.modules["fake_kernel_mod"].VALUE == 2

        # broken edit: error surfaces, old module keeps running
        mod_path.write_text("VALUE = (unclosed\n")
        os.utime(mod_path, (time.time() + 2, time.time() + 2))
        res = reloader.reload_if_changed()
        assert not res.ok and "fake_kernel_mod" in res.error
        assert sys.modules["fake_kernel_mod"].VALUE == 2

        # fixing the file reloads again (mtime was not committed on failure)
        _write_module(mod_path, 3)
        os.utime(mod_path, (time.time() + 3, time.time() + 3))
        res = reloader.reload_if_changed()
        assert res.ok and sys.modules["fake_kernel_mod"].VALUE == 3
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("fake_kernel_mod", None)

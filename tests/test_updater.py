"""Updater: version parsing, snooze/skip persistence, notification
policy (reference: picasso/updater.py:27 get_latest_version,
:138 check_and_notify). Network calls are monkeypatched out."""

from __future__ import annotations

import datetime

import pytest

from picasso_tpu import __version__, updater


@pytest.fixture(autouse=True)
def isolated_settings(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))


class TestVersionParsing:
    def test_numeric_tuples(self):
        assert updater._parse_version("1.2.3") == (1, 2, 3)
        assert updater._parse_version("0.10.3") > (0, 9, 9)

    def test_non_numeric_suffix(self):
        assert updater._parse_version("1.2rc1.0") == (1, 21, 0)
        assert updater._parse_version("x.y") == (0, 0)


class TestCheckForUpdate:
    def test_offline_returns_none(self, monkeypatch):
        monkeypatch.setattr(
            updater, "get_latest_version", lambda *a, **k: None
        )
        assert updater.check_for_update() is None
        assert not updater.is_update_available()

    def test_newer_version_detected(self, monkeypatch):
        monkeypatch.setattr(
            updater, "get_latest_version", lambda *a, **k: "999.0.0"
        )
        assert updater.check_for_update() == "999.0.0"
        assert updater.is_update_available()

    def test_same_or_older_ignored(self, monkeypatch):
        monkeypatch.setattr(
            updater, "get_latest_version", lambda *a, **k: __version__
        )
        assert updater.check_for_update() is None


class TestNotifyPolicy:
    def test_notify_fires_once_per_new_version(self, monkeypatch):
        monkeypatch.setattr(
            updater, "get_latest_version", lambda *a, **k: "999.0.0"
        )
        messages = []
        assert (
            updater.check_and_notify(notify=messages.append)
            == "999.0.0"
        )
        assert "999.0.0" in messages[0]
        updater.skip_version("999.0.0")
        assert updater.check_and_notify(notify=messages.append) is None
        assert len(messages) == 1

    def test_snooze_silences(self, monkeypatch):
        monkeypatch.setattr(
            updater, "get_latest_version", lambda *a, **k: "999.0.0"
        )
        updater.snooze(days=3)
        assert updater.check_and_notify(notify=lambda m: None) is None
        assert not updater.should_check_today()

    def test_should_check_today_and_mark(self, monkeypatch):
        assert updater.should_check_today()
        updater.mark_checked()
        assert not updater.should_check_today()

    def test_update_url(self):
        assert updater.get_update_url().startswith("https://")

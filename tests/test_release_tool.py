"""Unit tests for tools/release.py — the reference's release.py:1-123
analogue (semver bump from bracketed conventional commit keywords,
grouped changelog, pyproject version rewrite). Pure-function tests plus
one end-to-end run against a throwaway git repo."""

from __future__ import annotations

import datetime
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO / "tools") not in sys.path:
    sys.path.insert(0, str(REPO / "tools"))

import release  # noqa: E402


def test_classify_and_decide_bump():
    assert release.classify_commit("[feat] add x") == "minor"
    assert release.classify_commit("[FIX] repair y") == "patch"
    assert release.classify_commit("[major] break everything") == "major"
    assert release.classify_commit("no keyword at all") == "patch"
    assert release.decide_bump(["[fix] a", "[feat] b"]) == "minor"
    assert release.decide_bump(["[fix] a", "[major] b", "[feat] c"]) == "major"
    assert release.decide_bump(["plain"]) == "patch"


def test_next_version():
    assert release.next_version("v1.2.3", "patch") == "v1.2.4"
    assert release.next_version("v1.2.3", "minor") == "v1.3.0"
    assert release.next_version("v1.2.3", "major") == "v2.0.0"
    assert release.next_version(None, "patch") == "v0.0.1"


def test_rewrite_version_touches_only_the_version_line():
    text = 'name = "pkg"\nversion = "1.0.0"\ndescription = "version = \\"x\\""\n'
    out = release.rewrite_version(text, "2.11.0")
    assert 'version = "2.11.0"' in out
    assert out.count("2.11.0") == 1
    assert 'name = "pkg"' in out


def test_changelog_section_groups_and_prepends():
    section = release.render_changelog_section(
        "v1.1.0", "2026-08-14",
        ["[feat] add operator\n\nbody ignored", "[fix] null bug", "plain chore"],
    )
    assert section.splitlines()[0] == "## v1.1.0 – 2026-08-14"
    assert "### Features" in section and "- [feat] add operator" in section
    assert "### Fixes & Others" in section and "- plain chore" in section
    assert "### Major Changes" not in section  # empty bucket omitted

    merged = release.prepend_changelog(
        "# Changelog\n\n## v1.0.0 – 2026-01-01\n\n### Features\n- old\n",
        section,
    )
    assert merged.startswith("# Changelog\n\n## v1.1.0")
    assert merged.index("v1.1.0") < merged.index("v1.0.0")  # newest on top


def test_release_end_to_end_in_throwaway_repo(tmp_path):
    def git(*args):
        subprocess.run(
            ["git", *args], cwd=tmp_path, check=True, capture_output=True,
            env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                 "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                 "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": str(tmp_path)},
        )

    git("init", "-q")
    # identity in the repo config: release.py's own git subprocesses
    # (tag -a) need it too, and they don't inherit this test's env
    git("config", "user.name", "t")
    git("config", "user.email", "t@t")
    (tmp_path / "pyproject.toml").write_text('version = "0.0.0"\n')
    git("add", "pyproject.toml")
    git("commit", "-q", "-m", "[feat] first operator")

    info = release.release(str(tmp_path), apply=False)
    assert info == {
        "last_tag": None, "bump": "minor", "new_tag": "v0.1.0",
        "n_commits": 1, "applied": False,
    }
    # dry run wrote nothing
    assert not (tmp_path / "CHANGELOG.md").exists()

    info = release.release(
        str(tmp_path), apply=True, today=datetime.date(2026, 8, 14)
    )
    assert info["applied"] and info["new_tag"] == "v0.1.0"
    assert 'version = "0.1.0"' in (tmp_path / "pyproject.toml").read_text()
    log = (tmp_path / "CHANGELOG.md").read_text()
    assert "## v0.1.0 – 2026-08-14" in log and "- [feat] first operator" in log
    tags = subprocess.run(
        ["git", "tag"], cwd=tmp_path, capture_output=True, text=True
    ).stdout.split()
    assert tags == ["v0.1.0"]
    # the TAGGED commit must itself carry the rewrites: a checkout of
    # v0.1.0 builds a package that self-reports 0.1.0, not 0.0.0
    tagged_pyproject = subprocess.run(
        ["git", "show", "v0.1.0:pyproject.toml"],
        cwd=tmp_path, capture_output=True, text=True, check=True,
    ).stdout
    assert 'version = "0.1.0"' in tagged_pyproject
    # and the release leaves the tree clean (rewrites were committed)
    dirty = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=tmp_path, capture_output=True, text=True, check=True,
    ).stdout
    assert dirty == ""

    # next release: a fix on top bumps patch from the new tag — and the
    # release commit itself sits BEHIND the tag, so it is not re-counted
    (tmp_path / "x.txt").write_text("x")
    git("add", "x.txt")
    git("commit", "-q", "-m", "[fix] a bug")
    info = release.release(str(tmp_path), apply=False)
    assert (info["last_tag"], info["bump"], info["new_tag"]) == (
        "v0.1.0", "patch", "v0.1.1",
    )
    assert info["n_commits"] == 1  # "[fix] a bug" only, not "Release v0.1.0"

    # a modified TRACKED file is refused: the release commit must
    # contain nothing but the release rewrites
    (tmp_path / "x.txt").write_text("stray edit")
    try:
        release.release(str(tmp_path), apply=True)
        raise AssertionError("dirty tree should have been refused")
    except RuntimeError:
        pass
    git("checkout", "--", "x.txt")
    assert not (tmp_path / "CHANGELOG.md").read_text().startswith(
        "# Changelog\n\n## v0.1.1"
    )  # refusal wrote nothing

    # UNTRACKED files don't block a release — they can never enter the
    # commit (only the two rewrites are staged, explicitly)
    (tmp_path / "scratch.log").write_text("build noise")
    info = release.release(
        str(tmp_path), apply=True, today=datetime.date(2026, 8, 15)
    )
    assert info["applied"] and info["new_tag"] == "v0.1.1"
    assert (tmp_path / "scratch.log").exists()  # untouched, uncommitted
    tracked = subprocess.run(
        ["git", "ls-tree", "-r", "--name-only", "v0.1.1"],
        cwd=tmp_path, capture_output=True, text=True, check=True,
    ).stdout.split()
    assert "scratch.log" not in tracked


def test_last_tag_ignores_non_release_tags(tmp_path):
    """Round-9 hardening (r8 ADVICE): a nearer non-semver tag (e.g.
    'bench-baseline') must not shadow the release tag, and next_version
    refuses a malformed tag loudly instead of raising a bare ValueError
    from map(int, ...)."""
    import subprocess

    import pytest

    from tools.release import last_tag, next_version

    repo = str(tmp_path / "r")
    subprocess.run(["git", "init", "-q", repo], check=True)
    env_args = dict(cwd=repo, check=True, capture_output=True)
    subprocess.run(["git", "-c", "user.email=t@t", "-c", "user.name=t",
                    "commit", "--allow-empty", "-m", "one"], **env_args)
    subprocess.run(["git", "-c", "user.email=t@t", "-c", "user.name=t",
                    "tag", "-a", "v1.2.3", "-m", "rel"], **env_args)
    subprocess.run(["git", "-c", "user.email=t@t", "-c", "user.name=t",
                    "commit", "--allow-empty", "-m", "two"], **env_args)
    subprocess.run(["git", "-c", "user.email=t@t", "-c", "user.name=t",
                    "tag", "-a", "bench-baseline", "-m", "not a release"],
                   **env_args)
    assert last_tag(repo) == "v1.2.3"
    assert next_version(last_tag(repo), "patch") == "v1.2.4"

    with pytest.raises(ValueError, match="not a release tag"):
        next_version("bench-baseline", "patch")
    # repeated-v forms are also malformed, not silently stripped
    with pytest.raises(ValueError, match="not a release tag"):
        next_version("vv1.2.3", "patch")

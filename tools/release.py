"""Release tooling: semver bump + grouped changelog from git history.

Analogue of the reference's ``release.py:1-123`` (its one non-engine
dev tool): commit messages since the last tag carry bracketed
conventional keywords — ``[major]`` forces a major bump, ``[feat]`` /
``[feature]`` a minor one, anything else (including ``[fix]``,
``[perf]``, ``[refactor]``, ``[style]``, ``[chore]``, ``[build]``,
``[ci]``, ``[test]``) a patch — and the release step tags the repo,
rewrites the ``version = "..."`` line in pyproject.toml, and PREPENDS a
grouped section to CHANGELOG.md.

Deviations from the reference, both deliberate:

- plain ``git`` subprocess instead of GitPython (no extra dependency);
- NO automatic push: the reference pushes branch + tag as part of the
  release; here ``--apply`` stops after the release commit + tag so a
  human reviews before publishing (push is one command, losing work to
  a bad auto-push is not). The rewrites are COMMITTED before tagging —
  the tag must point at a commit that already carries the version bump
  and changelog section it announces — and a dirty tree is refused so
  the release commit contains nothing else.

Default is a dry run that prints the decision; ``--apply`` executes.
All decision logic is pure functions so tests never need a repo.
"""

from __future__ import annotations

import argparse
import datetime
import os
import re
import subprocess

#: bump level -> bracketed keywords (reference release.py:12-17)
CONVENTIONAL_TYPES = {
    "major": ["major"],
    "minor": ["feat", "feature"],
    "patch": ["fix", "perf", "refactor", "style", "chore", "build", "ci", "test"],
}

_VERSION_RE = re.compile(r'version\s*=\s*"[^"]+"')


def classify_commit(message: str) -> str:
    """Bump level a single commit message asks for: first matching
    bracketed keyword wins, checked major → minor → patch; no keyword
    means patch (the reference's default)."""
    low = message.lower()
    for level, keywords in CONVENTIONAL_TYPES.items():
        if any(f"[{kw}]" in low for kw in keywords):
            return level
    return "patch"


def decide_bump(messages: list[str]) -> str:
    """Strongest level any commit asks for (major > minor > patch)."""
    levels = {classify_commit(m) for m in messages}
    for level in ("major", "minor", "patch"):
        if level in levels:
            return level
    return "patch"


def next_version(last_tag: str | None, level: str) -> str:
    """``vX.Y.Z`` after applying ``level`` to ``last_tag`` (None → the
    first release counts up from v0.0.0). A non-semver tag is refused
    loudly — it means tag discovery picked up something that is not a
    release tag (last_tag() filters, but a caller can pass anything)."""
    if last_tag is not None and not re.fullmatch(r"v\d+\.\d+\.\d+", last_tag):
        raise ValueError(
            f"not a release tag: {last_tag!r} (expected vMAJOR.MINOR.PATCH)"
        )
    major, minor, patch = (
        map(int, last_tag.removeprefix("v").split(".")) if last_tag else (0, 0, 0)
    )
    if level == "major":
        return f"v{major + 1}.0.0"
    if level == "minor":
        return f"v{major}.{minor + 1}.0"
    return f"v{major}.{minor}.{patch + 1}"


def rewrite_version(pyproject_text: str, version: str) -> str:
    """The pyproject rewrite: replace the first ``version = "..."``
    assignment (reference release.py:53-59)."""
    return _VERSION_RE.sub(f'version = "{version}"', pyproject_text, count=1)


def render_changelog_section(
    new_tag: str, release_date: str, messages: list[str]
) -> str:
    """The grouped section the reference prepends (release.py:88-101):
    first line of each commit, bucketed by bump level, empty buckets
    omitted."""
    grouped: dict[str, list[str]] = {"major": [], "minor": [], "patch": []}
    for m in messages:
        first = m.strip().splitlines()[0] if m.strip() else ""
        if first:
            grouped[classify_commit(m)].append(first)
    lines = [f"## {new_tag} – {release_date}", ""]
    for level, title in (
        ("major", "Major Changes"),
        ("minor", "Features"),
        ("patch", "Fixes & Others"),
    ):
        if grouped[level]:
            lines.append(f"### {title}")
            lines.extend(f"- {m}" for m in grouped[level])
            lines.append("")
    return "\n".join(lines)


def prepend_changelog(existing: str, section: str) -> str:
    """New section goes on top, header stays on top of everything."""
    header = "# Changelog"
    body = existing
    if body.startswith(header):
        body = body[len(header):].lstrip("\n")
    return f"{header}\n\n{section}\n{body}".rstrip("\n") + "\n"


# ---------------------------------------------------------------------------
# git plumbing (subprocess; every call read-only except create_tag)
# ---------------------------------------------------------------------------


def _git(*args: str, cwd: str | None = None) -> str:
    return subprocess.run(
        ["git", *args], check=True, capture_output=True, text=True, cwd=cwd
    ).stdout.strip()


def last_tag(cwd: str | None = None) -> str | None:
    # --match constrains discovery to release tags: a repo also carrying
    # e.g. 'bench-baseline' or 'deploy-2026-08' tags must not feed those
    # into next_version (bare --tags returns the NEAREST tag of any form)
    try:
        return (
            _git("describe", "--tags", "--abbrev=0",
                 "--match", "v[0-9]*.[0-9]*.[0-9]*", cwd=cwd)
            or None
        )
    except subprocess.CalledProcessError:
        return None  # no tags yet (or none matching the release form)


def commit_messages_since(tag: str | None, cwd: str | None = None) -> list[str]:
    rev = f"{tag}..HEAD" if tag else "HEAD"
    raw = _git("log", "--format=%B%x00", rev, cwd=cwd)
    return [m.strip() for m in raw.split("\x00") if m.strip()]


def release(
    repo_dir: str = ".",
    apply: bool = False,
    today: datetime.date | None = None,
) -> dict:
    """Decide (and with ``apply`` execute) a release: returns
    ``{last_tag, bump, new_tag, n_commits, applied}``."""
    prev = last_tag(cwd=repo_dir)
    messages = commit_messages_since(prev, cwd=repo_dir)
    if not messages:
        return {"last_tag": prev, "bump": None, "new_tag": prev,
                "n_commits": 0, "applied": False}
    bump = decide_bump(messages)
    new_tag = next_version(prev, bump)
    if apply:
        # The rewrites must be IN the tagged commit: tagging HEAD first
        # would publish a tag whose pyproject still carries the old
        # version (a checkout of vX.Y.Z building a package that
        # self-reports the previous release) and whose changelog lacks
        # the section it announces — and the follow-up commit holding
        # the rewrites would then be re-counted by the NEXT release's
        # commit_messages_since(tag). So: refuse on a dirty tree (the
        # release commit must contain only the release rewrites), write,
        # commit, and tag the commit that contains them.
        # untracked files are fine — the release stages only its own two
        # rewrites explicitly, and `git commit` (whole-index) can only
        # pick up staged/modified TRACKED files
        if _git("status", "--porcelain", "--untracked-files=no", cwd=repo_dir):
            raise RuntimeError(
                "working tree has uncommitted tracked changes — commit or "
                "stash first so the release commit contains only the "
                "version/changelog rewrite"
            )
        section = render_changelog_section(
            new_tag, str(today or datetime.date.today()), messages
        )
        changelog = os.path.join(repo_dir, "CHANGELOG.md")
        existing = (
            open(changelog, encoding="utf-8").read()
            if os.path.exists(changelog)
            else ""
        )
        with open(changelog, "w", encoding="utf-8") as f:
            f.write(prepend_changelog(existing, section))
        written = ["CHANGELOG.md"]
        pyproject = os.path.join(repo_dir, "pyproject.toml")
        if os.path.exists(pyproject):
            text = open(pyproject, encoding="utf-8").read()
            with open(pyproject, "w", encoding="utf-8") as f:
                f.write(rewrite_version(text, new_tag.removeprefix("v")))
            written.append("pyproject.toml")
        _git("add", "--", *written, cwd=repo_dir)
        _git("commit", "-m", f"Release {new_tag}", cwd=repo_dir)
        _git("tag", "-a", new_tag, "-m", f"Release {new_tag}", cwd=repo_dir)
    return {"last_tag": prev, "bump": bump, "new_tag": new_tag,
            "n_commits": len(messages), "applied": apply}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--repo", default=".")
    ap.add_argument("--apply", action="store_true",
                    help="tag + rewrite files (default: dry run)")
    args = ap.parse_args()
    info = release(args.repo, apply=args.apply)
    mode = "APPLIED" if info["applied"] else "dry-run"
    print(
        f"[{mode}] {info['last_tag'] or '(no tag)'} -> {info['new_tag']} "
        f"({info['bump']}, {info['n_commits']} commits)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

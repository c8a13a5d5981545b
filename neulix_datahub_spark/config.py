"""Secret / configuration layer (parity with the reference's
``GoogleSecretManager``, ``core/configs/secret.py:1-88``).

The reference exposes three operations against Google Secret Manager:
``access_secret(secret_id, version_id="latest")``, ``create_secret`` and
``add_secret_version`` — all errors logged, not raised, with access
returning ``None`` on failure (``secret.py:37-54``).

The portable analogue keeps that exact surface behind a small store
protocol with two backends:

- ``EnvSecretStore`` — secrets from environment variables
  (``<PREFIX><SECRET_ID>``), the standard container/K8s delivery path;
  read-only (creating env secrets at runtime is not a thing), versions
  other than "latest" are unavailable.
- ``InMemorySecretStore`` — full create/add-version/access semantics
  (versions are 1-based, "latest" resolves to the newest), used in tests
  and as the template for wiring a real manager (Google/AWS/Vault) in
  deployment.

No cloud SDK is imported here — deployments subclass ``SecretStore`` and
delegate to their manager of choice.
"""

from __future__ import annotations

import os


class SecretStore:
    """Reference surface (``secret.py:37-88``); subclass per backend."""

    def access_secret(self, secret_id: str, version_id: str = "latest") -> str | None:
        raise NotImplementedError

    def create_secret(self, secret_id: str) -> None:
        raise NotImplementedError

    def add_secret_version(self, secret_id: str, payload: str) -> int:
        raise NotImplementedError


class EnvSecretStore(SecretStore):
    """Environment-variable backend: ``access_secret("db_password")``
    reads ``NEULIX_SECRET_DB_PASSWORD`` (configurable prefix). Mirrors
    the reference's access contract: missing secret → ``None``, never an
    exception (``secret.py:37-54``)."""

    def __init__(self, prefix: str = "NEULIX_SECRET_"):
        self.prefix = prefix

    def _key(self, secret_id: str) -> str:
        return f"{self.prefix}{secret_id.upper().replace('-', '_')}"

    def access_secret(self, secret_id: str, version_id: str = "latest") -> str | None:
        if version_id != "latest":
            return None  # env vars carry only the current version
        return os.environ.get(self._key(secret_id))

    def create_secret(self, secret_id: str) -> None:
        raise NotImplementedError("env-var secrets are provisioned by the platform")

    def add_secret_version(self, secret_id: str, payload: str) -> int:
        raise NotImplementedError("env-var secrets are provisioned by the platform")


class InMemorySecretStore(SecretStore):
    """Full create / add-version / access semantics (``secret.py:56-88``):
    versions are 1-based and "latest" resolves to the newest."""

    def __init__(self) -> None:
        self._secrets: dict[str, list[str]] = {}

    def access_secret(self, secret_id: str, version_id: str = "latest") -> str | None:
        versions = self._secrets.get(secret_id)
        if not versions:
            return None
        if version_id == "latest":
            return versions[-1]
        try:
            idx = int(version_id)
        except ValueError:
            return None
        return versions[idx - 1] if 1 <= idx <= len(versions) else None

    def create_secret(self, secret_id: str) -> None:
        self._secrets.setdefault(secret_id, [])

    def add_secret_version(self, secret_id: str, payload: str) -> int:
        self._secrets.setdefault(secret_id, []).append(payload)
        return len(self._secrets[secret_id])


def smtp_config_from_secrets(store: SecretStore) -> dict[str, object]:
    """Bridge: resolve the SMTP transport fields through the secret layer
    (the reference wires Secret Manager values into ``logs.py``'s
    ``build_smtp_transport`` the same way)."""
    return {
        "smtp_host": store.access_secret("smtp_host"),
        "smtp_port": store.access_secret("smtp_port"),
        "smtp_user": store.access_secret("smtp_user"),
        "smtp_password": store.access_secret("smtp_password"),
        "smtp_from": store.access_secret("smtp_from"),
    }

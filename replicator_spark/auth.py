"""Azure Entra ID (OAuth2) authentication — token providers for sinks
and sources that talk to Entra-protected stores.

Re-expresses the reference's ``pkg/auth`` package
(``azure_entra.go:17-467``, ``provider.go:11-39``, ``models.go:9-174``,
``mongo_client.go:294-391``). The reference delegates the wire flow to
the Azure SDK (``azidentity``) and keeps the orchestration — config
validation, method selection, a scope-keyed token cache with a 5-minute
early-expiry buffer, retry, and authentication metrics. Here BOTH
layers are real: the orchestration is re-expressed 1:1, and the wire
flow is the public Microsoft-identity-platform protocol implemented
directly on stdlib ``urllib`` —

* client credentials (service principal): form-POST to
  ``{authority}/{tenant}/oauth2/v2.0/token`` with
  ``grant_type=client_credentials`` (the flow
  ``azidentity.NewClientSecretCredential`` runs);
* managed identity: GET to the IMDS endpoint
  ``/metadata/identity/oauth2/token?api-version=2018-02-01`` with the
  ``Metadata: true`` header (the flow
  ``azidentity.NewManagedIdentityCredential`` runs).

The ``authority`` / ``imds_endpoint`` are injectable, so tests run the
FULL HTTP round trip against a local stdlib IdP fixture
(tests/test_auth.py) — no socket stand-in needed here, unlike the
replication-protocol transports. Certificate credentials raise
``NotImplementedError`` honestly: the reference's own loader is a
placeholder that errors (``azure_entra.go:438-442``).

Integration points:

* ``oidc_machine_callback`` — the MongoDB OIDC machine-flow callback
  shape (``mongo_client.go:294-333``): a zero-arg callable returning
  ``(access_token, expires_in_seconds)``, cache-backed, for handing to
  a Mongo driver's OIDC authenticator.
* ``JobConfig.auth`` (cli.py) may carry an ``AuthConfig`` dict; config
  validation runs ``AuthConfig.validate()`` Spark-free.

Everything here is driver-side control plane — tokens never enter a
Spark plan.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

DEFAULT_AUTHORITY = "https://login.microsoftonline.com/"
DEFAULT_IMDS = "http://169.254.169.254"
DEFAULT_SCOPES = ("https://graph.microsoft.com/.default",)
EXPIRY_BUFFER_S = 300  # models.go:130-135 — 5-minute early-expiry buffer


class AuthError(ValueError):
    """Configuration or token-acquisition failure (pkg/auth/errors.go)."""


@dataclass
class Credentials:
    """models.go:41-48."""

    access_token: str
    token_type: str = "Bearer"
    expires_in: int = 0
    expires_at: float = 0.0  # unix seconds
    refresh_token: str | None = None
    scope: str | None = None

    def is_expired(self, buffer_s: float = EXPIRY_BUFFER_S) -> bool:
        return time.time() + buffer_s > self.expires_at

    def time_to_expiry(self) -> float:
        return self.expires_at - time.time()


@dataclass
class RetryConfig:
    """models.go:33-38; defaults models.go:112-117."""

    max_attempts: int = 3
    initial_delay_s: float = 1.0
    max_delay_s: float = 10.0
    multiplier: float = 2.0

    def validate(self) -> list[str]:
        errs = []
        if self.max_attempts <= 0:
            errs.append("retry.max_attempts must be positive")
        if self.initial_delay_s <= 0:
            errs.append("retry.initial_delay_s must be positive")
        if self.max_delay_s < self.initial_delay_s:
            errs.append("retry.max_delay_s must be >= initial_delay_s")
        if self.multiplier <= 1.0:
            errs.append("retry.multiplier must be > 1.0")
        return errs


@dataclass
class EntraConfig:
    """models.go:17-24 — one credential flavor per populated field, in
    the reference's selection order (azure_entra.go:74-123):
    client_secret → certificate → user-assigned MI → system MI."""

    tenant_id: str = ""
    client_id: str = ""
    client_secret: str = ""
    cert_path: str = ""
    scopes: tuple[str, ...] = DEFAULT_SCOPES
    authority: str = DEFAULT_AUTHORITY
    imds_endpoint: str = DEFAULT_IMDS
    timeout_s: float = 30.0
    retry: RetryConfig = field(default_factory=RetryConfig)

    def validate(self) -> list[str]:
        """azure_entra.go:388-403 — tenant required only for the
        tenant-scoped flows; managed identity has no tenant."""
        errs = list(self.retry.validate())
        if self.client_secret or self.cert_path:
            if not self.tenant_id:
                errs.append("tenant_id is required")
            if not self.client_id:
                errs.append("client_id is required for service-principal auth")
        elif not self.client_id:
            # managed identity is the only tenant-less flow, and it
            # needs a client_id signal (user-assigned) — the reference
            # requires at least one configured method
            errs.append(
                "at least one authentication method must be configured "
                "(client_secret, cert_path, or client_id for managed "
                "identity)"
            )
        if self.timeout_s <= 0:
            errs.append("timeout_s must be positive")
        return errs

    @staticmethod
    def from_dict(d: dict) -> "EntraConfig":
        allowed = {
            "tenant_id", "client_id", "client_secret", "cert_path",
            "scopes", "authority", "imds_endpoint", "timeout_s", "retry",
        }
        unknown = set(d) - allowed
        if unknown:
            raise AuthError(f"unknown auth config keys: {sorted(unknown)}")
        kw = dict(d)
        if "scopes" in kw:
            kw["scopes"] = tuple(kw["scopes"])
        if "retry" in kw:
            kw["retry"] = RetryConfig(**kw["retry"])
        return EntraConfig(**kw)


@dataclass
class AuthMetrics:
    """models.go:91-104 — moving-average latency per
    azure_entra.go:325-357."""

    total_attempts: int = 0
    successful_auths: int = 0
    failed_auths: int = 0
    success_rate: float = 0.0
    average_latency_s: float = 0.0
    tokens_issued: int = 0
    last_success_at: float | None = None
    last_failure_at: float | None = None

    def record(self, success: bool, latency_s: float, issued: bool) -> None:
        self.total_attempts += 1
        if success:
            self.successful_auths += 1
            self.last_success_at = time.time()
        else:
            self.failed_auths += 1
            self.last_failure_at = time.time()
        if issued:
            self.tokens_issued += 1
        self.success_rate = self.successful_auths / self.total_attempts
        n = self.total_attempts
        self.average_latency_s = (
            self.average_latency_s * (n - 1) + latency_s
        ) / n


def _http_json(req: urllib.request.Request, timeout_s: float) -> dict:
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
        return json.loads(resp.read().decode())


class AzureEntraProvider:
    """azure_entra.go:18-26 + GetToken (126-165): scope-keyed token
    cache with the 5-minute early-expiry buffer, retry with exponential
    backoff (models.go RetryConfig — the reference declares it on
    AuthConfig; applied here at the token call), and metrics."""

    def __init__(self, config: EntraConfig):
        errs = config.validate()
        if errs:
            raise AuthError(
                "invalid Azure Entra configuration: " + "; ".join(errs)
            )
        if config.cert_path:
            # the reference's own certificate loader is a placeholder
            # that always errors (azure_entra.go:438-442) — stay honest
            raise NotImplementedError(
                "certificate credentials are not implemented (the "
                "reference's loadCertificateFromPath is a placeholder "
                "error too)"
            )
        self.config = config
        self._cache: dict[str, Credentials] = {}
        self._lock = threading.Lock()
        self.metrics = AuthMetrics()

    # -- cache ---------------------------------------------------------------

    def _cache_key(self, scopes: tuple[str, ...]) -> str:
        return f"{self.config.client_id}:{list(scopes)}"

    def clear_cache(self) -> None:
        with self._lock:
            self._cache.clear()

    def cached_token_count(self) -> int:
        with self._lock:
            return len(self._cache)

    # -- token acquisition ---------------------------------------------------

    def get_token(self, scopes: tuple[str, ...] | None = None) -> Credentials:
        scopes = tuple(scopes) if scopes else self.config.scopes
        key = self._cache_key(scopes)
        t0 = time.monotonic()
        with self._lock:
            cached = self._cache.get(key)
            if cached is not None and not cached.is_expired():
                self.metrics.record(True, time.monotonic() - t0, False)
                return cached
            self._cache.pop(key, None)
        try:
            creds = self._request_with_retry(scopes)
        except Exception:
            with self._lock:
                self.metrics.record(False, time.monotonic() - t0, False)
            raise
        with self._lock:
            self._cache[key] = creds
            self.metrics.record(True, time.monotonic() - t0, True)
        return creds

    def _request_with_retry(self, scopes: tuple[str, ...]) -> Credentials:
        r = self.config.retry
        delay = r.initial_delay_s
        last: Exception | None = None
        for attempt in range(r.max_attempts):
            if attempt:
                time.sleep(min(delay, r.max_delay_s))
                delay *= r.multiplier
            try:
                return self._request_token(scopes)
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                # 4xx protocol errors are config bugs — never retried
                if isinstance(e, urllib.error.HTTPError) and e.code < 500:
                    body = e.read().decode(errors="replace")[:500]
                    raise AuthError(
                        f"token request rejected ({e.code}): {body}"
                    ) from e
                last = e
        raise AuthError(
            f"failed to get access token after {r.max_attempts} attempts: "
            f"{last}"
        ) from last

    def _request_token(self, scopes: tuple[str, ...]) -> Credentials:
        if self.config.client_secret:
            data = self._client_credentials(scopes)
        else:
            data = self._managed_identity(scopes)
        if "access_token" not in data:
            raise AuthError(f"token response missing access_token: {data}")
        expires_in = int(data.get("expires_in", 0))
        return Credentials(
            access_token=data["access_token"],
            token_type=data.get("token_type", "Bearer"),
            expires_in=expires_in,
            expires_at=time.time() + expires_in,
            scope=" ".join(scopes),
        )

    def _client_credentials(self, scopes: tuple[str, ...]) -> dict:
        """OAuth2 client-credentials grant against the v2.0 endpoint —
        the flow azidentity.NewClientSecretCredential performs."""
        url = (
            self.config.authority.rstrip("/")
            + f"/{self.config.tenant_id}/oauth2/v2.0/token"
        )
        body = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": self.config.client_id,
                "client_secret": self.config.client_secret,
                "scope": " ".join(scopes),
            }
        ).encode()
        req = urllib.request.Request(  # noqa: S310
            url,
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        return _http_json(req, self.config.timeout_s)

    def _managed_identity(self, scopes: tuple[str, ...]) -> dict:
        """IMDS flow — GET with Metadata: true; scope → resource by
        stripping the /.default suffix (what azidentity does)."""
        resource = scopes[0]
        if resource.endswith("/.default"):
            resource = resource[: -len("/.default")]
        q = {"api-version": "2018-02-01", "resource": resource}
        if self.config.client_id:
            q["client_id"] = self.config.client_id
        url = (
            self.config.imds_endpoint.rstrip("/")
            + "/metadata/identity/oauth2/token?"
            + urllib.parse.urlencode(q)
        )
        req = urllib.request.Request(  # noqa: S310
            url, headers={"Metadata": "true"}, method="GET"
        )
        return _http_json(req, self.config.timeout_s)

    # -- the rest of the TokenProvider surface (models.go:61-73) --------------

    def refresh_token(self, refresh_token: str) -> Credentials:
        raise AuthError(
            "token refresh not supported for Azure Entra ID - tokens are "
            "automatically refreshed"
        )  # azure_entra.go:168-172

    def revoke_token(self, token: str) -> None:
        raise AuthError(
            "token revocation not supported for Azure Entra ID - tokens "
            "expire automatically"
        )  # azure_entra.go:204-208

    def validate_token(self, token: str) -> dict:
        """azure_entra.go:175-201 — structural check only."""
        if not token:
            return {
                "success": False,
                "error": "token is empty",
                "error_code": "EMPTY_TOKEN",
                "timestamp": time.time(),
            }
        return {
            "success": True,
            "credentials": Credentials(access_token=token),
            "timestamp": time.time(),
        }


class AzureEntraAuthenticator:
    """azure_entra.go:37-40, 211-281 — a name-keyed provider registry
    with double-checked creation; ``authenticate`` returns a result
    dict instead of raising (the reference's AuthenticationResult)."""

    SUPPORTED_METHODS = (
        "azure_entra",
        "managed_identity",
        "service_principal",
        "client_credentials",
    )

    def __init__(self):
        self._providers: dict[str, AzureEntraProvider] = {}
        self._lock = threading.Lock()

    def get_provider(
        self, config: EntraConfig | dict, name: str = "default"
    ) -> AzureEntraProvider:
        if isinstance(config, dict):
            config = EntraConfig.from_dict(config)
        with self._lock:
            p = self._providers.get(name)
            if p is None:
                p = AzureEntraProvider(config)
                self._providers[name] = p
            return p

    def validate_config(self, config: EntraConfig | dict) -> list[str]:
        if isinstance(config, dict):
            try:
                config = EntraConfig.from_dict(config)
            except (AuthError, TypeError) as e:
                return [str(e)]
        return config.validate()

    def authenticate(self, config: EntraConfig | dict) -> dict:
        errs = self.validate_config(config)
        if errs:
            return {
                "success": False,
                "error": f"invalid configuration: {'; '.join(errs)}",
                "error_code": "INVALID_CONFIG",
                "timestamp": time.time(),
            }
        try:
            provider = self.get_provider(config)
        except (AuthError, NotImplementedError, TypeError) as e:
            return {
                "success": False,
                "error": f"failed to create provider: {e}",
                "error_code": "PROVIDER_CREATION_FAILED",
                "timestamp": time.time(),
            }
        try:
            creds = provider.get_token()
        except AuthError as e:
            return {
                "success": False,
                "error": f"authentication failed: {e}",
                "error_code": "AUTH_FAILED",
                "timestamp": time.time(),
            }
        return {"success": True, "credentials": creds, "timestamp": time.time()}


def oidc_machine_callback(provider: AzureEntraProvider, scopes=None):
    """mongo_client.go:294-333 — the MongoDB OIDC machine-flow callback:
    a zero-arg callable returning ``(access_token, expires_in_s)`` that
    rides the provider's cache (getOrRefreshToken semantics — a near-
    expiry token re-fetches through the provider's buffer logic)."""

    def _callback() -> tuple[str, float]:
        creds = provider.get_token(scopes)
        return creds.access_token, max(creds.time_to_expiry(), 0.0)

    return _callback

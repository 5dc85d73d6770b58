"""Azure Entra auth provider — full HTTP round trips against a local
stdlib IdP fixture (no Spark session needed; pure driver-side control
plane). Mirrors the reference's offline test strategy
(pkg/auth/azure_entra_test.go, mongo_client_test.go:163-239)."""

import json
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from replicator_spark.auth import (
    AuthError,
    AzureEntraAuthenticator,
    AzureEntraProvider,
    Credentials,
    EntraConfig,
    RetryConfig,
    oidc_machine_callback,
)


class _FakeIdP(BaseHTTPRequestHandler):
    """Serves both the v2.0 token endpoint (POST) and IMDS (GET)."""

    state = None  # set per-fixture

    def log_message(self, *a):  # quiet
        pass

    def _reply(self, code, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        st = self.state
        st["requests"].append(
            {
                "path": self.path,
                "method": "POST",
                "form": dict(
                    urllib.parse.parse_qsl(
                        self.rfile.read(
                            int(self.headers["Content-Length"])
                        ).decode()
                    )
                ),
            }
        )
        if st["fail_next"] > 0:
            st["fail_next"] -= 1
            self._reply(500, {"error": "server_error"})
            return
        if st.get("reject"):
            self._reply(400, {"error": "invalid_client"})
            return
        st["issued"] += 1
        self._reply(
            200,
            {
                "access_token": f"tok-{st['issued']}",
                "token_type": "Bearer",
                "expires_in": st["expires_in"],
            },
        )

    def do_GET(self):
        st = self.state
        st["requests"].append(
            {
                "path": self.path,
                "method": "GET",
                "metadata_header": self.headers.get("Metadata"),
            }
        )
        st["issued"] += 1
        self._reply(
            200,
            {
                "access_token": f"mi-tok-{st['issued']}",
                "token_type": "Bearer",
                "expires_in": st["expires_in"],
            },
        )


@pytest.fixture()
def idp():
    state = {"requests": [], "issued": 0, "fail_next": 0, "expires_in": 3600}
    handler = type("H", (_FakeIdP,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


def _cfg(url, **kw):
    kw.setdefault("tenant_id", "t-1")
    kw.setdefault("client_id", "c-1")
    kw.setdefault("client_secret", "s-1")
    kw.setdefault("authority", url)
    kw.setdefault(
        "retry", RetryConfig(initial_delay_s=0.01, max_delay_s=0.05)
    )
    return EntraConfig(**kw)


def test_client_credentials_flow(idp):
    url, state = idp
    p = AzureEntraProvider(_cfg(url))
    creds = p.get_token()
    assert creds.access_token == "tok-1"
    assert creds.token_type == "Bearer"
    assert not creds.is_expired()
    # the wire shape: v2.0 endpoint under the tenant, full form body
    (req,) = state["requests"]
    assert req["path"] == "/t-1/oauth2/v2.0/token"
    assert req["form"] == {
        "grant_type": "client_credentials",
        "client_id": "c-1",
        "client_secret": "s-1",
        "scope": "https://graph.microsoft.com/.default",
    }


def test_token_cache_and_early_expiry(idp):
    url, state = idp
    p = AzureEntraProvider(_cfg(url))
    a = p.get_token()
    b = p.get_token()
    assert a.access_token == b.access_token == "tok-1"
    assert state["issued"] == 1  # second call served from cache
    assert p.cached_token_count() == 1
    # within the 5-minute early-expiry buffer → re-fetch, not reuse
    state["expires_in"] = 200
    p.clear_cache()
    c = p.get_token()
    assert c.access_token == "tok-2"
    d = p.get_token()
    assert d.access_token == "tok-3", "a 200s token is inside the buffer"
    # distinct scopes cache separately (azure_entra.go:285-287)
    state["expires_in"] = 3600
    e = p.get_token(("https://vault.azure.net/.default",))
    assert e.access_token == "tok-4"
    assert p.get_token().access_token == "tok-5"  # default-scope slot expired
    assert p.cached_token_count() == 2
    m = p.metrics
    assert m.tokens_issued == 5 and m.total_attempts == 6
    assert m.successful_auths == 6 and m.success_rate == 1.0


def test_retry_then_success_and_hard_failure(idp):
    url, state = idp
    p = AzureEntraProvider(_cfg(url))
    state["fail_next"] = 2
    creds = p.get_token()  # 2 × 500 then 200 within max_attempts=3
    assert creds.access_token == "tok-1"
    assert len(state["requests"]) == 3
    p.clear_cache()
    state["fail_next"] = 10
    with pytest.raises(AuthError, match="after 3 attempts"):
        p.get_token()
    assert p.metrics.failed_auths == 1
    # 4xx is a config bug — rejected immediately, never retried
    p.clear_cache()
    state["fail_next"] = 0
    state["reject"] = True
    n0 = len(state["requests"])
    with pytest.raises(AuthError, match="invalid_client"):
        p.get_token()
    assert len(state["requests"]) == n0 + 1


def test_managed_identity_imds(idp):
    url, state = idp
    p = AzureEntraProvider(
        EntraConfig(
            client_id="mi-1",
            imds_endpoint=url,
            retry=RetryConfig(initial_delay_s=0.01, max_delay_s=0.05),
        )
    )
    creds = p.get_token(("https://storage.azure.com/.default",))
    assert creds.access_token == "mi-tok-1"
    (req,) = state["requests"]
    assert req["method"] == "GET"
    assert req["metadata_header"] == "true"
    q = dict(
        urllib.parse.parse_qsl(urllib.parse.urlsplit(req["path"]).query)
    )
    # scope → resource by stripping /.default; user-assigned id forwarded
    assert q == {
        "api-version": "2018-02-01",
        "resource": "https://storage.azure.com",
        "client_id": "mi-1",
    }


def test_config_validation():
    assert EntraConfig(tenant_id="t").validate()  # no method
    assert EntraConfig(client_secret="s").validate()  # missing tenant+client
    assert not EntraConfig(client_id="mi").validate()  # MI needs no tenant
    assert not EntraConfig(
        tenant_id="t", client_id="c", client_secret="s"
    ).validate()
    bad = EntraConfig(
        tenant_id="t", client_id="c", client_secret="s",
        retry=RetryConfig(max_attempts=0, multiplier=1.0),
    ).validate()
    assert len(bad) == 2
    with pytest.raises(AuthError, match="unknown auth config keys"):
        EntraConfig.from_dict({"tenant": "typo"})
    # certificate path: honest NotImplementedError (the reference's own
    # loader is a placeholder error, azure_entra.go:438-442)
    with pytest.raises(NotImplementedError):
        AzureEntraProvider(
            EntraConfig(tenant_id="t", client_id="c", cert_path="/x.pem")
        )


def test_authenticator_registry_and_results(idp):
    url, _ = idp
    a = AzureEntraAuthenticator()
    cfg = _cfg(url)
    p1 = a.get_provider(cfg)
    p2 = a.get_provider(cfg)
    assert p1 is p2  # double-checked registry (azure_entra.go:359-384)
    res = a.authenticate(cfg)
    assert res["success"] and res["credentials"].access_token == "tok-1"
    bad = a.authenticate({"tenant_id": "t"})
    assert not bad["success"]
    assert bad["error_code"] == "INVALID_CONFIG"
    assert a.validate_config({"tenant_id": "t"})
    assert not a.validate_config(cfg)
    assert "service_principal" in a.SUPPORTED_METHODS


def test_unsupported_token_ops_and_validate(idp):
    url, _ = idp
    p = AzureEntraProvider(_cfg(url))
    with pytest.raises(AuthError, match="refresh not supported"):
        p.refresh_token("rt")
    with pytest.raises(AuthError, match="revocation not supported"):
        p.revoke_token("t")
    assert p.validate_token("")["error_code"] == "EMPTY_TOKEN"
    ok = p.validate_token("abc")
    assert ok["success"] and ok["credentials"].access_token == "abc"


def test_oidc_machine_callback(idp):
    """mongo_client.go:294-333 — the callback rides the cache and
    reports remaining lifetime."""
    url, state = idp
    p = AzureEntraProvider(_cfg(url))
    cb = oidc_machine_callback(p, ("https://cosmos.azure.com/.default",))
    tok, ttl = cb()
    assert tok == "tok-1" and 3590 < ttl <= 3600
    tok2, _ = cb()
    assert tok2 == "tok-1" and state["issued"] == 1  # cache hit


def test_credentials_expiry_helpers():
    c = Credentials(access_token="x", expires_at=time.time() + 3600)
    assert not c.is_expired()
    assert c.is_expired(buffer_s=3601)
    assert 3590 < c.time_to_expiry() <= 3600


def test_jobconfig_auth_validation():
    """JobConfig.auth runs EntraConfig validation Spark-free at config
    load, like transform_rules/event_filter."""
    from replicator_spark.cli import JobConfig

    base = dict(name="j", feed_dir="/f", table_root="/t", streaming=False)
    ok = JobConfig.from_dict(
        {**base, "auth": {"tenant_id": "t", "client_id": "c",
                          "client_secret": "s"}}
    )
    assert not ok.validate()
    bad = JobConfig.from_dict({**base, "auth": {"tenant_id": "t"}})
    assert any(e.startswith("auth:") for e in bad.validate())
    typo = JobConfig.from_dict({**base, "auth": {"tenannt_id": "t"}})
    assert any("unknown auth config keys" in e for e in typo.validate())

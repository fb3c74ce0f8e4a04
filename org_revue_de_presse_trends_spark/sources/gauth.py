"""Google OAuth2 service-account token flow for the Firebase sink.

Public protocol (developers.google.com/identity/protocols/oauth2/
service-account): service-account JSON → RS256-signed JWT assertion →
POST to the token endpoint → short-lived access token.  This mirrors
what the reference gets from its OAuth2 client library
(trends.go:225-239 builds a Google OAuth2 client from the
service-account JSON); here the exchange is explicit so the sink has
no extra runtime deps beyond ``cryptography`` for the RS256 signature
(gated behind an import-try).

Design points:

- injectable ``clock`` and ``http_post`` so tests can pin time and fake
  the token endpoint — no network, no real keys in CI.
- tokens are cached and refreshed ``refresh_skew`` seconds before
  expiry; one provider instance is safe to share across sink writes in
  a partition (refresh is lock-guarded for the thread-pool fan-out).
"""

from __future__ import annotations

import base64
import json
import threading
import time
from collections.abc import Callable, Sequence

GOOGLE_TOKEN_URI = "https://oauth2.googleapis.com/token"
JWT_BEARER_GRANT = "urn:ietf:params:oauth:grant-type:jwt-bearer"

# The scopes the reference's Firebase RTDB client requests.
DEFAULT_SCOPES = (
    "https://www.googleapis.com/auth/userinfo.email",
    "https://www.googleapis.com/auth/firebase.database",
)


def _b64url(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii")


def _b64url_json(obj: dict) -> str:
    return _b64url(
        json.dumps(obj, separators=(",", ":"), sort_keys=True).encode()
    )


def _rs256_sign(private_key_pem: str, data: bytes) -> bytes:
    try:
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding
    except ImportError as exc:  # pragma: no cover — present in this env
        raise NotImplementedError(
            "RS256 signing requires the 'cryptography' package"
        ) from exc
    key = serialization.load_pem_private_key(
        private_key_pem.encode(), password=None
    )
    return key.sign(data, padding.PKCS1v15(), hashes.SHA256())


def _urllib_post_form(url: str, form: dict) -> dict:
    import urllib.parse
    import urllib.request

    req = urllib.request.Request(
        url,
        data=urllib.parse.urlencode(form).encode(),
        method="POST",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req, timeout=10.0) as resp:
        return json.loads(resp.read())


class ServiceAccountTokenProvider:
    """Mint and cache Google OAuth2 access tokens from a service-account
    key (the parsed ``config.firebase.json``-style dict: needs
    ``client_email``, ``private_key``, optional ``token_uri``)."""

    def __init__(
        self,
        info: dict,
        scopes: Sequence[str] = DEFAULT_SCOPES,
        clock: Callable[[], float] = time.time,
        http_post: Callable[[str, dict], dict] | None = None,
        refresh_skew: float = 60.0,
        jwt_lifetime: float = 3600.0,
    ):
        self._info = info
        self._scopes = tuple(scopes)
        self._clock = clock
        self._http_post = http_post or _urllib_post_form
        self._refresh_skew = refresh_skew
        self._jwt_lifetime = jwt_lifetime
        self._token: str | None = None
        self._expiry = 0.0
        self._lock = threading.Lock()

    @classmethod
    def from_file(cls, path: str, **kwargs) -> "ServiceAccountTokenProvider":
        with open(path) as f:
            return cls(json.load(f), **kwargs)

    @property
    def token_uri(self) -> str:
        return self._info.get("token_uri", GOOGLE_TOKEN_URI)

    def signed_jwt(self, now: float) -> str:
        header = {"alg": "RS256", "typ": "JWT"}
        claims = {
            "iss": self._info["client_email"],
            "scope": " ".join(self._scopes),
            "aud": self.token_uri,
            "iat": int(now),
            "exp": int(now + self._jwt_lifetime),
        }
        signing_input = f"{_b64url_json(header)}.{_b64url_json(claims)}"
        signature = _rs256_sign(
            self._info["private_key"], signing_input.encode("ascii")
        )
        return f"{signing_input}.{_b64url(signature)}"

    def token(self) -> str:
        with self._lock:
            now = self._clock()
            if self._token is None or now >= self._expiry - self._refresh_skew:
                resp = self._http_post(
                    self.token_uri,
                    {
                        "grant_type": JWT_BEARER_GRANT,
                        "assertion": self.signed_jwt(now),
                    },
                )
                self._token = resp["access_token"]
                self._expiry = now + float(resp.get("expires_in", 3600))
            return self._token

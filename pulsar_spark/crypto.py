"""Message-level end-to-end encryption — the MessageCrypto analog.

Reference semantics: producers encrypt each payload with a rotating
symmetric data key; the data key is wrapped (asymmetrically encrypted)
once per configured recipient public key and shipped in message
metadata, so any holder of a matching private key can unwrap it and
read the stream (pulsar-client-api/.../api/MessageCrypto.java;
pulsar-client-messagecrypto-bc/.../MessageCryptoBc.java — AES/GCM data
key, RSA key wrapping; PulsarApi.proto MessageMetadata
``encryption_keys``/``encryption_param``/``encryption_algo``).

Spark-first: encryption state is COLUMNS, not connection state —
``encrypted_payload`` (AES-256-GCM ciphertext), ``encryption_param``
(per-row 96-bit nonce), ``encryption_keys`` (key-name -> RSA-OAEP
wrapped data key, identical for every row of a batch = the reference's
per-batch key rotation). The AES work runs in Arrow-batched pandas UDFs
(the cipher is C under the hood via the ``cryptography`` package);
everything else stays JVM-side. Key unwrap happens ONCE driver-side on
decrypt — executors only ever see the symmetric data key, mirroring the
reference's consumer, which unwraps once per key rotation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

AES_KEY_BYTES = 32  # AES-256-GCM, MessageCryptoBc's data-key size
NONCE_BYTES = 12

#: ConsumerCryptoFailureAction (pulsar-client-api/.../api/
#: ConsumerCryptoFailureAction.java:30): what to do with a message the
#: consumer cannot decrypt. FAIL = delivery fails (raise), DISCARD =
#: silently drop the message, CONSUME = deliver the ENCRYPTED payload
#: to the application, flagged. ProducerCryptoFailureAction
#: (ProducerCryptoFailureAction.java): FAIL = the send fails, SEND =
#: publish unencrypted when encryption fails.
FAIL, DISCARD, CONSUME, SEND = "FAIL", "DISCARD", "CONSUME", "SEND"


def generate_rsa_keypair() -> tuple[bytes, bytes]:
    """(private_pem, public_pem) helper for tests/CLI — the reference
    reads PEM key files from the producer/consumer config."""
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    priv = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    pub = key.public_key().public_bytes(
        serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo
    )
    return priv, pub


def _wrap_data_key(data_key: bytes, public_pem: bytes) -> bytes:
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    pub = serialization.load_pem_public_key(public_pem)
    return pub.encrypt(
        data_key,
        padding.OAEP(
            mgf=padding.MGF1(algorithm=hashes.SHA256()),
            algorithm=hashes.SHA256(),
            label=None,
        ),
    )


def _unwrap_data_key(wrapped: bytes, private_pem: bytes) -> bytes:
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    priv = serialization.load_pem_private_key(private_pem, password=None)
    return priv.decrypt(
        wrapped,
        padding.OAEP(
            mgf=padding.MGF1(algorithm=hashes.SHA256()),
            algorithm=hashes.SHA256(),
            label=None,
        ),
    )


def new_producer_key_context(public_keys: dict[str, bytes]) -> dict:
    """One producer-side key rotation: mint a fresh AES-256 data key
    and wrap it ONCE per recipient public key. Reuse the returned
    context across ``encrypt_messages`` calls and replace it on an
    interval — the reference's producer regenerates its data key on a
    timer (MessageCryptoBc's dataKeyGenerator rotation), not per send,
    which keeps the topic's distinct rotation count ~retention/interval
    instead of ~appends. The WHOLE context (key + wrapped bytes) is the
    reuse unit: RSA-OAEP wrapping is randomized, so re-wrapping the
    same data key per call would still mint a new distinct wrapped
    value and defeat the consumer-side per-rotation unwrap bound.
    Raises on an unwrappable recipient PEM — callers wanting
    ProducerCryptoFailureAction.SEND semantics for context creation
    handle that at ``encrypt_messages`` time by not passing a context."""
    if not public_keys:
        raise ValueError("encryption enabled but no public keys given")
    data_key = os.urandom(AES_KEY_BYTES)
    return {
        "data_key": data_key,
        "wrapped": {
            name: _wrap_data_key(data_key, pem) for name, pem in public_keys.items()
        },
    }


def encrypt_messages(
    df: DataFrame,
    public_keys: dict[str, bytes],
    payload_col: str = "payload",
    failure_action: str = FAIL,
    key_context: dict | None = None,
) -> DataFrame:
    """Producer-side encryption (MessageCrypto.encrypt): replaces
    ``payload_col`` with AES-256-GCM ciphertext and adds
    ``encryption_param`` (per-row nonce) plus one
    ``encryption_key__<name>`` column per recipient holding the wrapped
    data key (constant per batch — a literal, so it costs nothing per
    row). By default each call mints a FRESH data key (one rotation per
    append). A long-lived producer session should pass a ``key_context``
    (:func:`new_producer_key_context`, rotated on an interval) so the
    topic's distinct rotation count stays bounded over its life — that
    bound is what keeps ``decrypt_messages``' per-rotation unwrap pass
    small. Raises if ``public_keys`` is empty, like the reference's
    producer with encryption enabled but no keys.

    ``failure_action`` is ProducerCryptoFailureAction: ``FAIL``
    (default) propagates a key-wrap error (bad recipient PEM) and the
    send fails; ``SEND`` publishes the batch UNENCRYPTED instead —
    same schema as the unencrypted producer (no encryption columns),
    the reference's explicit availability-over-confidentiality trade.
    """
    if not public_keys:
        raise ValueError("encryption enabled but no public keys given")
    if failure_action not in (FAIL, SEND):
        raise ValueError(f"unknown ProducerCryptoFailureAction: {failure_action}")
    if key_context is not None:
        data_key = key_context["data_key"]
        wrapped = dict(key_context["wrapped"])
        if set(wrapped) != set(public_keys):
            raise ValueError(
                "key_context recipients do not match public_keys — rotate the "
                "context (new_producer_key_context) when recipients change"
            )
    else:
        data_key = os.urandom(AES_KEY_BYTES)
        try:
            wrapped = {
                name: _wrap_data_key(data_key, pem)
                for name, pem in public_keys.items()
            }
        except Exception:
            if failure_action == FAIL:
                raise
            return df  # SEND: publish unencrypted

    from pyspark.sql.types import StructField, StructType

    enc_t = StructType(
        [
            StructField("ct", BinaryType()),
            StructField("nonce", BinaryType()),
        ]
    )

    @F.pandas_udf(enc_t)
    def _enc(payloads):
        import pandas as pd
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        gcm = AESGCM(data_key)
        # nonce minted per row from the OS CSPRNG inside the executor —
        # GCM nonce uniqueness must not rest on a seeded SQL PRNG
        rows = []
        for p in payloads:
            if p is None:
                rows.append({"ct": None, "nonce": None})
            else:
                n = os.urandom(NONCE_BYTES)
                rows.append({"ct": gcm.encrypt(n, bytes(p), None), "nonce": n})
        # explicit columns: a zero-row Arrow batch must still produce a
        # frame with the struct's fields (pd.DataFrame([]) has none)
        return pd.DataFrame(rows, columns=["ct", "nonce"])

    out = df.withColumn("_e", _enc(F.col(payload_col)))
    out = (
        out.withColumn(payload_col, F.col("_e.ct"))
        .withColumn("encryption_param", F.col("_e.nonce"))
        .drop("_e")
        .withColumn("encryption_algo", F.lit("AES-256-GCM"))
    )
    for name, wk in wrapped.items():
        out = out.withColumn(f"encryption_key__{name}", F.lit(wk))
    return out


def decrypt_messages(
    df: DataFrame,
    key_name: str,
    private_pem: bytes,
    payload_col: str = "payload",
    failure_action: str = FAIL,
) -> DataFrame:
    """Consumer-side decryption (MessageCrypto.decrypt): unwraps each
    DISTINCT wrapped data key ONCE driver-side from the
    ``encryption_key__<name>`` column (the reference's consumer unwraps
    once per rotation too), then AES-GCM-decrypts payloads with the
    per-row nonce and the row's own data key, so a topic mixing several
    rotations decrypts in one pass.

    ROTATION-COUNT BOUND: the distinct-collect, the RSA unwraps, and
    the key map shipped in the UDF closure all scale with the number of
    DISTINCT rotations IN THE FRAME BEING READ — which is small for a
    per-batch streaming read regardless of producer behavior, and small
    for a full-history read only if the producer reused its data key
    across appends (``encrypt_messages(key_context=
    new_producer_key_context(...))``, the reference's interval
    rotation). A full-history read of a topic whose producer
    minted a fresh key per append pays one unwrap per append — if you
    own both ends, reuse keys; if not, read in bounded batches.

    ``failure_action`` is ConsumerCryptoFailureAction
    (ConsumerCryptoFailureAction.java:30), applied PER ROW to the two
    real failure modes — no usable data key (NULL wrapped value after
    a recipient change, or a wrapped value this private key cannot
    unwrap) and GCM authentication failure (tampered ciphertext or
    nonce):

    - ``FAIL`` (default): the batch fails loudly on the first
      undecryptable row — delivery stalls, nothing is silently lost;
    - ``DISCARD``: undecryptable rows are dropped from the result;
    - ``CONSUME``: undecryptable rows pass through with the ENCRYPTED
      payload intact and ``crypto_failure = true``; decrypted rows
      carry ``crypto_failure = false``. Under CONSUME the
      ``encryption_param`` / ``encryption_key__*`` / ``encryption_algo``
      columns are KEPT (the application needs them to decrypt the
      flagged rows later); FAIL/DISCARD drop them as before."""
    if failure_action not in (FAIL, DISCARD, CONSUME):
        raise ValueError(f"unknown ConsumerCryptoFailureAction: {failure_action}")
    col = f"encryption_key__{key_name}"
    if col not in df.columns:
        raise KeyError(f"no wrapped data key for consumer key '{key_name}'")
    # Bounded: one distinct wrapped value per producer key rotation.
    # This pre-pass is one COLUMN-PRUNED scan of the wrapped-key column
    # (constant per batch file, so dictionary-encoded) — deliberately
    # paid on the driver so the RSA private key NEVER ships to
    # executors (the module contract: workers only ever see symmetric
    # data keys); the decrypt pass itself reads payload+nonce+key and
    # does the AES work, which dominates.
    rotations = [
        bytes(r[0]) for r in df.select(col).distinct().collect() if r[0] is not None
    ]
    key_map: dict[bytes, bytes] = {}
    for wk in rotations:
        try:
            key_map[wk] = _unwrap_data_key(wk, private_pem)
        except Exception:
            if failure_action == FAIL:
                raise
            # DISCARD/CONSUME: rows under this rotation are per-row
            # failures, handled below

    from pyspark.sql.types import BooleanType, StructField, StructType

    dec_t = StructType(
        [StructField("pt", BinaryType()), StructField("ok", BooleanType())]
    )

    @F.pandas_udf(dec_t)
    def _dec(payloads, nonces, wrappeds):
        import pandas as pd
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        gcms = {wk: AESGCM(k) for wk, k in key_map.items()}
        rows = []
        for p, n, w in zip(payloads, nonces, wrappeds):
            if p is None:
                rows.append({"pt": None, "ok": True})  # tombstone payload
                continue
            gcm = gcms.get(bytes(w)) if w is not None else None
            if gcm is None or n is None:
                if failure_action == "FAIL":
                    raise ValueError(
                        "ConsumerCryptoFailureAction.FAIL: no usable data "
                        f"key for consumer key '{key_name}'"
                    )
                rows.append({"pt": None, "ok": False})
                continue
            try:
                rows.append({"pt": gcm.decrypt(bytes(n), bytes(p), None), "ok": True})
            except Exception:
                if failure_action == "FAIL":
                    raise ValueError(
                        "ConsumerCryptoFailureAction.FAIL: GCM authentication "
                        "failed (tampered ciphertext or nonce)"
                    )
                rows.append({"pt": None, "ok": False})
        # explicit columns: a zero-row Arrow batch must still produce a
        # frame with the struct's fields (pd.DataFrame([]) has none)
        return pd.DataFrame(rows, columns=["pt", "ok"])

    drop = [c for c in df.columns if c.startswith("encryption_key__")]
    out = df.withColumn(
        "_d", _dec(F.col(payload_col), F.col("encryption_param"), F.col(col))
    )
    if failure_action == CONSUME:
        return (
            out.withColumn(
                payload_col,
                F.when(F.col("_d.ok"), F.col("_d.pt")).otherwise(F.col(payload_col)),
            )
            .withColumn("crypto_failure", ~F.col("_d.ok"))
            .drop("_d")
        )
    out = out.where(F.col("_d.ok")) if failure_action == DISCARD else out
    return (
        out.withColumn(payload_col, F.col("_d.pt"))
        .drop("_d", "encryption_param", "encryption_algo", *drop)
    )


def decrypt_failed_rows(
    consumed: DataFrame,
    key_name: str,
    private_pem: bytes,
    payload_col: str = "payload",
    failure_action: str = CONSUME,
) -> DataFrame:
    """The application-side recovery half of
    ``ConsumerCryptoFailureAction.CONSUME``: rows a prior
    ``decrypt_messages(..., failure_action=CONSUME)`` pass flagged
    (``crypto_failure = true``) retried under a DIFFERENT consumer key
    — the flow after a delayed key delivery or rotation catch-up. The
    already-decrypted rows pass through untouched; only flagged rows
    re-enter ``decrypt_messages`` (their encryption context was kept by
    the CONSUME contract exactly for this). Returns the union with a
    fresh ``crypto_failure`` column (rows failing under BOTH keys stay
    flagged when ``failure_action=CONSUME``; ``DISCARD`` drops them;
    ``FAIL`` raises)."""
    if "crypto_failure" not in consumed.columns:
        raise ValueError("decrypt_failed_rows expects a CONSUME-mode result "
                         "(missing crypto_failure column)")
    ok = consumed.where(~F.col("crypto_failure"))
    retry = decrypt_messages(
        consumed.where(F.col("crypto_failure")).drop("crypto_failure"),
        key_name,
        private_pem,
        payload_col=payload_col,
        failure_action=failure_action,
    )
    if failure_action != CONSUME:
        # FAIL raises inside decrypt; DISCARD drops — both land on a
        # frame without the flag, so re-add it for a stable schema
        retry = retry.withColumn("crypto_failure", F.lit(False))
        keep = [c for c in retry.columns if c in ok.columns]
        return ok.select(*keep).unionByName(retry.select(*keep))
    return ok.unionByName(retry)

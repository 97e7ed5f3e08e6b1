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


def encrypt_messages(
    df: DataFrame,
    public_keys: dict[str, bytes],
    payload_col: str = "payload",
) -> DataFrame:
    """Producer-side encryption (MessageCrypto.encrypt): replaces
    ``payload_col`` with AES-256-GCM ciphertext and adds
    ``encryption_param`` (per-row nonce) plus one
    ``encryption_key__<name>`` column per recipient holding the wrapped
    data key (constant per batch — a literal, so it costs nothing per
    row). Raises if ``public_keys`` is empty, like the reference's
    producer with encryption enabled but no keys."""
    if not public_keys:
        raise ValueError("encryption enabled but no public keys given")
    data_key = os.urandom(AES_KEY_BYTES)

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
        return pd.DataFrame(rows)

    out = df.withColumn("_e", _enc(F.col(payload_col)))
    out = (
        out.withColumn(payload_col, F.col("_e.ct"))
        .withColumn("encryption_param", F.col("_e.nonce"))
        .drop("_e")
        .withColumn("encryption_algo", F.lit("AES-256-GCM"))
    )
    for name, pem in public_keys.items():
        out = out.withColumn(
            f"encryption_key__{name}", F.lit(_wrap_data_key(data_key, pem))
        )
    return out


def decrypt_messages(
    df: DataFrame,
    key_name: str,
    private_pem: bytes,
    payload_col: str = "payload",
) -> DataFrame:
    """Consumer-side decryption (MessageCrypto.decrypt): unwraps the
    data key ONCE driver-side from the ``encryption_key__<name>``
    column (constant per batch), then AES-GCM-decrypts payloads with the
    per-row nonce. GCM authentication means tampered ciphertext fails
    loudly, not silently."""
    col = f"encryption_key__{key_name}"
    if col not in df.columns:
        raise KeyError(f"no wrapped data key for consumer key '{key_name}'")
    wrapped = df.select(col).limit(1).collect()
    if not wrapped:
        # empty frame: no data key to unwrap, but the OUTPUT SCHEMA must
        # not depend on row count — drop the encryption columns exactly
        # like the non-empty path does
        drop = [c for c in df.columns if c.startswith("encryption_key__")]
        return df.drop("encryption_param", "encryption_algo", *drop)
    data_key = _unwrap_data_key(bytes(wrapped[0][0]), private_pem)

    @F.pandas_udf(BinaryType())
    def _dec(payloads, nonces):
        import pandas as pd
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        gcm = AESGCM(data_key)
        return pd.Series(
            [
                None if p is None else gcm.decrypt(bytes(n), bytes(p), None)
                for p, n in zip(payloads, nonces)
            ]
        )

    drop = [c for c in df.columns if c.startswith("encryption_key__")]
    return (
        df.withColumn(payload_col, _dec(F.col(payload_col), F.col("encryption_param")))
        .drop("encryption_param", "encryption_algo", *drop)
    )

"""map_batches stage bodies and codecs (pure functions / callable classes —
no Ray session management here)."""

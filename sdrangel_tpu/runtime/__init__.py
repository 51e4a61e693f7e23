"""Host runtime: block pipeline engine, device sets, settings, messages."""

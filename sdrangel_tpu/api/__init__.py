"""REST control plane (reference: sdrbase/webapi + swagger)."""

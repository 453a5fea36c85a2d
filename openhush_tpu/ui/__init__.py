"""Desktop UX shell: system tray (StatusNotifierItem) and the web-based
preferences/first-run-wizard UI (reference: src/tray/, src/gui/)."""

# Firejail profile for the openhush-tpu daemon.
# Install: sudo cp profiles/firejail/openhush.profile /etc/firejail/
# Run:     firejail --profile=openhush openhush start --foreground
#
# Role parity with the reference's firejail profile (audio in, display
# out, user D-Bus, localhost network), adapted for a Python/JAX process:
# the interpreter must not be blocked, and TPU device nodes replace the
# CUDA/ROCm device whitelist.

quiet
include /etc/firejail/disable-common.inc
include /etc/firejail/disable-programs.inc
include /etc/firejail/disable-xdg.inc
# NOT included: disable-interpreters.inc (openhush is a Python program).

# --- Allowed paths -------------------------------------------------------
whitelist ${HOME}/.config/openhush
mkdir ${HOME}/.config/openhush
noblacklist ${HOME}/.config/openhush

whitelist ${HOME}/.local/share/openhush
mkdir ${HOME}/.local/share/openhush
noblacklist ${HOME}/.local/share/openhush
# Model weights are read-only after download
read-only ${HOME}/.local/share/openhush/models

# JAX persistent compilation cache
whitelist ${HOME}/.cache/jax
mkdir ${HOME}/.cache/jax

# PulseAudio/PipeWire client config
whitelist ${HOME}/.config/pulse
read-only ${HOME}/.config/pulse

# --- Audio ---------------------------------------------------------------
whitelist /dev/snd
whitelist /proc/asound
whitelist ${RUNUSER}/pulse
whitelist ${RUNUSER}/pipewire-0
whitelist ${RUNUSER}/pipewire-0-manager

# Hotkey listener reads raw input events (optional; drop if using a
# compositor-level binding instead)
whitelist /dev/input
noblacklist /dev/input

# --- TPU accelerator -----------------------------------------------------
whitelist /dev/accel0
whitelist /dev/accel1
whitelist /dev/accel2
whitelist /dev/accel3
whitelist /dev/vfio
noblacklist /sys/class/accel

# --- D-Bus (control plane, notifications, tray) --------------------------
dbus-user filter
dbus-user.own org.openhush.*
dbus-user.talk org.freedesktop.Notifications
dbus-user.talk org.kde.StatusNotifierWatcher
dbus-user.talk org.kde.StatusNotifierItem-*
dbus-user.talk com.canonical.dbusmenu
dbus-system none

# --- Paste helpers -------------------------------------------------------
whitelist /usr/bin/xdotool
whitelist /usr/bin/wtype
whitelist /usr/bin/wl-copy

# --- Network: localhost only (REST API, optional Ollama) -----------------
netfilter
protocol unix,inet,inet6

# --- Hardening -----------------------------------------------------------
caps.drop all
seccomp
seccomp.block-secondary
noroot
nonewprivs
nogroups
nou2f
notv
novideo
ipc-namespace
machine-id
